from fusiondepth_tpu.utils.logging import MetricLogger, sec_to_hm_str

__all__ = ["MetricLogger", "sec_to_hm_str"]
