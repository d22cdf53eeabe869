"""Torch transcription of the reference's full loss pipeline — the
end-to-end oracle for JAX train-step parity (test_train_step_torch_parity).

Everything here is *transcribed* from the reference (cited per function),
not imported and not copied verbatim: it re-states the math in functional
torch so the JAX implementation can be checked against an independent
executable of the reference semantics, at float64.

Reference sources:
- layers.py:11-20   disp_to_depth
- layers.py:23-97   transformation_from_parameters / rot_from_axisangle /
                    get_translation_matrix
- layers.py:133-162 BackprojectDepth
- layers.py:204-226 Project3D
- layers.py:235-248 get_smooth_loss
- layers.py:251-281 SSIM
- trainer.py:425-474 generate_images_pred (F.grid_sample border,
                     align_corners=False default)
- trainer.py:476-488 compute_reprojection_loss (0.85 SSIM + 0.15 L1)
- trainer.py:490-596 compute_losses (automask w/ tie-break noise,
                     normalized smoothness / 2^scale, SI loss depth*26)

All tensors are NCHW torch doubles. The automask tie-break noise is NOT
drawn here — callers inject the exact arrays the JAX step drew so both
sides see identical values (reference trainer.py:549-551 draws fresh
gaussian noise * 1e-5 per scale).
"""

import torch
import torch.nn.functional as F


def disp_to_depth_t(disp, min_depth, max_depth):
    """layers.py:11-20."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


def rot_from_axisangle_t(vec):
    """layers.py:59-97; vec (B, 1, 3) -> (B, 4, 4)."""
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca = torch.cos(angle)
    sa = torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4), dtype=vec.dtype)
    rot[:, 0, 0] = (x * xC + ca).squeeze()
    rot[:, 0, 1] = (xyC - zs).squeeze()
    rot[:, 0, 2] = (zxC + ys).squeeze()
    rot[:, 1, 0] = (xyC + zs).squeeze()
    rot[:, 1, 1] = (y * yC + ca).squeeze()
    rot[:, 1, 2] = (yzC - xs).squeeze()
    rot[:, 2, 0] = (zxC - ys).squeeze()
    rot[:, 2, 1] = (yzC + xs).squeeze()
    rot[:, 2, 2] = (z * zC + ca).squeeze()
    rot[:, 3, 3] = 1
    return rot


def transformation_from_parameters_t(axisangle, translation, invert=False):
    """layers.py:23-56; axisangle/translation (B, 1, 3)."""
    R = rot_from_axisangle_t(axisangle)
    t = translation.clone()
    if invert:
        R = R.transpose(1, 2)
        t = -t
    T = torch.zeros((t.shape[0], 4, 4), dtype=t.dtype)
    T[:, 0, 0] = T[:, 1, 1] = T[:, 2, 2] = T[:, 3, 3] = 1
    T[:, :3, 3] = t.reshape(-1, 3)
    return torch.matmul(R, T) if invert else torch.matmul(T, R)


def backproject_t(depth, inv_K):
    """layers.py:133-162; depth (B, 1, H, W) -> homog points (B, 4, H*W)."""
    B, _, H, W = depth.shape
    ys, xs = torch.meshgrid(torch.arange(H, dtype=depth.dtype),
                            torch.arange(W, dtype=depth.dtype),
                            indexing="ij")
    ones = torch.ones(1, H * W, dtype=depth.dtype)
    pix = torch.cat([xs.reshape(1, -1), ys.reshape(1, -1), ones], 0)
    pix = pix.unsqueeze(0).expand(B, 3, H * W)
    cam = torch.matmul(inv_K[:, :3, :3], pix)
    cam = depth.reshape(B, 1, -1) * cam
    return torch.cat([cam, ones.unsqueeze(0).expand(B, 1, H * W)], 1)


def project_t(points, K, T, H, W, eps=1e-7):
    """layers.py:204-226; -> normalized grid (B, H, W, 2) in [-1, 1]."""
    B = points.shape[0]
    P = torch.matmul(K, T)[:, :3, :]
    cam = torch.matmul(P, points)
    pix = cam[:, :2, :] / (cam[:, 2, :].unsqueeze(1) + eps)
    pix = pix.reshape(B, 2, H, W).permute(0, 2, 3, 1)
    pix = pix / torch.tensor([W - 1, H - 1], dtype=pix.dtype)
    return (pix - 0.5) * 2


def ssim_t(x, y):
    """layers.py:251-281; per-pixel SSIM loss map, NCHW."""
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.pad(y, (1, 1, 1, 1), mode="reflect")
    mu_x = F.avg_pool2d(x, 3, 1)
    mu_y = F.avg_pool2d(y, 3, 1)
    sigma_x = F.avg_pool2d(x ** 2, 3, 1) - mu_x ** 2
    sigma_y = F.avg_pool2d(y ** 2, 3, 1) - mu_y ** 2
    sigma_xy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def reprojection_loss_t(pred, target):
    """trainer.py:476-488; -> (B, 1, H, W)."""
    l1 = torch.abs(target - pred).mean(1, True)
    ssim_err = ssim_t(pred, target).mean(1, True)
    return 0.85 * ssim_err + 0.15 * l1


def smooth_loss_t(disp, img):
    """layers.py:235-248 edge-aware smoothness, NCHW."""
    gdx = torch.abs(disp[:, :, :, :-1] - disp[:, :, :, 1:])
    gdy = torch.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    gix = torch.abs(img[:, :, :, :-1] - img[:, :, :, 1:]).mean(1, True)
    giy = torch.abs(img[:, :, :-1, :] - img[:, :, 1:, :]).mean(1, True)
    return (gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean()


def cat_xy_t(depth, inv_K):
    """layers.py:165-201 Cat_xy: backproject depth, then the hand-tuned
    normalizers x/30, y/2, (z-40)/40; depth (B, 1, H, W) -> (B, 3, H, W)."""
    B, _, H, W = depth.shape
    ys, xs = torch.meshgrid(torch.arange(H, dtype=depth.dtype),
                            torch.arange(W, dtype=depth.dtype),
                            indexing="ij")
    ones = torch.ones(1, H * W, dtype=depth.dtype)
    pix = torch.cat([xs.reshape(1, -1), ys.reshape(1, -1), ones], 0)
    pix = pix.unsqueeze(0).expand(B, 3, H * W)
    cam = torch.matmul(inv_K[:, :3, :3], pix)
    cam = depth.reshape(B, 1, -1) * cam
    cam = cam.reshape(B, 3, H, W).clone()
    cam[:, 0] = cam[:, 0] / 30.0
    cam[:, 1] = cam[:, 1] / 2.0
    cam[:, 2] = (cam[:, 2] - 40.0) / 40.0
    return cam


def build_pseudo3d_t(disps, beam, two_cha, inv_K_per_scale, H, W, scales,
                     crop, min_depth, max_depth, refine_a0=True, catxy=True):
    """refiner.py:316-346 pseudo-3D decoder-input construction.

    disps: {scale: refined-stage-1 disp (B, 1, Hs, Ws)}; beam (B, 1, H, W)
    meters/100; two_cha (B, 2, H, W); crop = (r0, r1, c0, c1) — the
    reference hard-codes [78:190, 23:617] at its 192x640 training res
    (refiner.py:330-331); at other resolutions the JAX build scales it
    proportionally, so the caller passes the same scaled window.
    Returns {scale: (B, 1+3+2, Hs, Ws)} (catxy) per refiner.py:344-346.
    """
    r0, r1, c0, c1 = crop
    mask = beam > 0
    crop_mask = torch.zeros_like(mask)
    crop_mask[:, :, r0:r1, c0:c1] = 1
    mask = mask * crop_mask

    out = {}
    disp_0 = disps[0]
    for scale in scales:
        if refine_a0:
            disp = disp_0
            disp_0 = F.max_pool2d(disp_0, 2, ceil_mode=True)
        else:
            disp = disps[scale]
        disp_full = F.interpolate(disp, [H, W], mode="bilinear",
                                  align_corners=False)
        _, depth = disp_to_depth_t(disp_full, min_depth, max_depth)
        ratio = (torch.median(beam[mask] * 100.0)
                 / torch.median(depth[mask]).detach())
        depth = depth * ratio
        scaled_disp = (F.interpolate(1.0 / depth, disp.shape[2:],
                                     mode="bilinear",
                                     align_corners=False) - 0.01) / 9.9
        if scale != 0:
            two_cha = F.max_pool2d(two_cha, 2, ceil_mode=True)
        if catxy:
            d = depth
            for _ in range(scale):
                d = F.max_pool2d(d, 2, ceil_mode=True)
            xyz = cat_xy_t(d, inv_K_per_scale[scale])
            out[scale] = torch.cat([scaled_disp, xyz, two_cha], 1)
        else:
            out[scale] = torch.cat([scaled_disp, two_cha], 1)
    return out


def refiner_si_loss_t(pred, target, threshold, si_var):
    """refiner.py:557-563 siloss: valid = target>1e-3 & 1e-3<pred<80 &
    |pred-target|<threshold; sqrt(var-focused SI) * 10."""
    valid = ((target > 1e-3) & (pred < 80) & (pred > 1e-3)
             & (torch.abs(pred - target) < threshold)).detach()
    d = torch.log(pred[valid]) - torch.log(target[valid])
    return torch.sqrt((d ** 2).mean() - si_var * (d.mean() ** 2)) * 10.0


def refiner_losses_t(disps, warped, colors, color_pyr, inf_gdc, noise,
                     H, W, scales, src_frames, min_depth, max_depth,
                     disparity_smoothness, gdc_loss_threshold, si_var,
                     gdc_loss_weight, gdc_loss_only_on_scale_0=True,
                     gama=1.0):
    """refiner.py:592-693 compute_losses for one refine pass: automasked
    photometric + smoothness (as trainer) + GDC-clone SI loss vs cached
    inf_gdc (weight gdc_loss_weight, x4 when scale-0-only), gamma-weighted.

    disps: the REFINED {scale: (B, 1, Hs, Ws)}; inf_gdc (B, H, W);
    noise {scale: (B, n_src, H, W)} already scaled by 1e-5.
    Returns total_loss / num_scales * gama (the summand added to
    losses["loss"] at refiner.py:691).
    """
    total = 0.0
    target = colors[0]
    for scale in scales:
        loss = 0.0
        reproj = torch.cat(
            [reprojection_loss_t(warped[(f, scale)], target)
             for f in src_frames], 1)
        identity = torch.cat(
            [reprojection_loss_t(colors[f], target) for f in src_frames], 1)
        identity = identity + noise[scale]
        combined = torch.cat((identity, reproj), dim=1)
        to_optimise, _ = torch.min(combined, dim=1)
        loss = loss + to_optimise.mean()

        disp = disps[scale]
        mean_disp = disp.mean(2, True).mean(3, True)
        norm_disp = disp / (mean_disp + 1e-7)
        smooth = smooth_loss_t(norm_disp, color_pyr[scale])
        loss = loss + disparity_smoothness * smooth / (2 ** scale)
        total = total + loss

        if (not gdc_loss_only_on_scale_0) or scale == 0:
            # reference interpolates to a hard-coded [192, 640] == its
            # training res (refiner.py:682); H, W here
            disp_full = F.interpolate(disp, [H, W], mode="bilinear",
                                      align_corners=False).squeeze(1)
            _, depth = disp_to_depth_t(disp_full, min_depth, max_depth)
            gdc_loss = refiner_si_loss_t(
                depth, inf_gdc, gdc_loss_threshold, si_var) * gdc_loss_weight
            if gdc_loss_only_on_scale_0:
                gdc_loss = gdc_loss * 4.0
            total = total + gdc_loss
    return total / len(scales) * gama


def si_loss_t(depth, beam_depth, threshold, si_var):
    """trainer.py:577-589: SI log loss vs the sparse beams; boolean-mask
    indexing exactly as the reference (depth pre-scaled by caller)."""
    valid = ((beam_depth > 1) & (depth < 80) & (depth > 1)
             & (torch.abs(depth - beam_depth) < threshold)).detach()
    d = torch.log(depth[valid]) - torch.log(beam_depth[valid])
    return torch.sqrt((d ** 2).mean() - si_var * (d.mean() ** 2)) * 0.1


def generate_images_pred_t(disps, cam_T_cam, colors, K, inv_K, H, W,
                           min_depth, max_depth):
    """trainer.py:425-474 at full-res warping (v1_multiscale off).

    disps: {scale: (B, 1, Hs, Ws)}; cam_T_cam: {frame_id: (B, 4, 4)};
    colors: {frame_id: (B, 3, H, W)} non-augmented frames.
    Returns ({(frame, scale): warped (B, 3, H, W)}, {scale: depth}).
    """
    warped, depths = {}, {}
    src_frames = [f for f in cam_T_cam]
    for scale in disps:
        disp = F.interpolate(disps[scale], [H, W], mode="bilinear",
                             align_corners=False)
        _, depth = disp_to_depth_t(disp, min_depth, max_depth)
        depths[scale] = depth
        cam_points = backproject_t(depth, inv_K)
        for f in src_frames:
            pix = project_t(cam_points, K, cam_T_cam[f], H, W)
            warped[(f, scale)] = F.grid_sample(
                colors[f], pix, padding_mode="border", align_corners=False)
    return warped, depths


def compute_losses_t(disps, warped, colors, color_pyr, four_beam, noise,
                     H, W, scales, src_frames, min_depth, max_depth,
                     disparity_smoothness, gdc_loss_threshold, si_var,
                     trainer_siloss=True, siloss_all_scale=True):
    """trainer.py:490-596: automasked photometric + smoothness + SI loss.

    noise: {scale: (B, n_src, H, W)} — the exact tie-break arrays the JAX
    step drew (already scaled by 1e-5).
    Returns the scalar total loss.
    """
    total = 0.0
    target = colors[0]
    for scale in scales:
        loss = 0.0
        reproj = torch.cat(
            [reprojection_loss_t(warped[(f, scale)], target)
             for f in src_frames], 1)
        identity = torch.cat(
            [reprojection_loss_t(colors[f], target) for f in src_frames], 1)
        identity = identity + noise[scale]
        combined = torch.cat((identity, reproj), dim=1)
        to_optimise, _ = torch.min(combined, dim=1)
        loss = loss + to_optimise.mean()

        disp = disps[scale]
        mean_disp = disp.mean(2, True).mean(3, True)
        norm_disp = disp / (mean_disp + 1e-7)
        smooth = smooth_loss_t(norm_disp, color_pyr[scale])
        loss = loss + disparity_smoothness * smooth / (2 ** scale)
        total = total + loss

        if trainer_siloss and (siloss_all_scale or scale == 0):
            disp_f = F.interpolate(disp, [H, W], mode="bilinear",
                                   align_corners=False)
            _, depth = disp_to_depth_t(disp_f, min_depth, max_depth)
            beam_depth = four_beam * 100.0
            depth = depth * 26.0
            total = total + si_loss_t(depth, beam_depth,
                                      gdc_loss_threshold, si_var)
    return total / len(scales)
