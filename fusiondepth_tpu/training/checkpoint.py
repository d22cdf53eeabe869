"""Checkpoint save/load via orbax, with the reference's logical bundle.

The reference saves per-net .pth state dicts under
log/<model>/models/weights_<tag>/{encoder,beam_encoder,...,adam}.pth with
height/width/use_stereo embedded in the encoder file (trainer.py:694-746).
Here one orbax checkpoint per tag holds {params, batch_stats, opt_state,
step, meta}; `meta` carries the shape info, and the run config is archived
as opt.json alongside (trainer.py:683-692).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from fusiondepth_tpu.config import Config


def _ckpt_dir(log_dir: str, model_name: str, tag: str) -> str:
    return os.path.abspath(
        os.path.join(log_dir, model_name, "models", f"weights_{tag}"))


def save_options(cfg: Config) -> None:
    d = os.path.join(cfg.log_dir, cfg.model_name, "models")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "opt.json"), "w") as f:
        f.write(cfg.to_json())


def save_checkpoint(cfg: Config, state, tag: str) -> str:
    """Save {params, batch_stats, opt_state, step} + shape metadata."""
    path = _ckpt_dir(cfg.log_dir, cfg.model_name, tag)
    meta = {
        "height": cfg.height,
        "width": cfg.width,
        "use_stereo": cfg.use_stereo,
        "num_layers": cfg.num_layers,
        "step": int(state.step),
    }
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(path: str, state, models_to_load=None) -> tuple:
    """Restore into the structure of `state`; returns (state, meta).

    Partial loads (reference trainer.py:717-746 filters the state dict) are
    handled by restoring only the subtrees present in the checkpoint.
    `models_to_load` (reference --models_to_load, options.py:153-157)
    restricts the restore to the named nets; others keep their current
    values, and the optimizer state is restored only when every net loads.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = ckptr.restore(path, template)
    if models_to_load is not None:
        sel = set(models_to_load)
        restored["params"] = {
            k: (restored["params"][k] if k in sel else v)
            for k, v in state.params.items()}
        restored["batch_stats"] = {
            k: (restored["batch_stats"][k] if k in sel else v)
            for k, v in state.batch_stats.items()}
        if not sel >= set(state.params):
            restored["opt_state"] = state.opt_state
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    import dataclasses

    new_state = dataclasses.replace(
        state,
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(meta.get("step", 0), jax.numpy.int32),
    )
    return new_state, meta
