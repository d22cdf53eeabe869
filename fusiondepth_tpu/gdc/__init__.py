from fusiondepth_tpu.gdc.gdc import gdc_correct, knn_brute, lle_weights

__all__ = ["gdc_correct", "knn_brute", "lle_weights"]
