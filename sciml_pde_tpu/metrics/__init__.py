from sciml_pde_tpu.metrics.metrics import (
    metric_func,
    nrmse_loss,
    lp_loss,
    fft_lp_loss,
    fft_mse_loss,
    inverse_metrics,
)

__all__ = [
    "metric_func",
    "nrmse_loss",
    "lp_loss",
    "fft_lp_loss",
    "fft_mse_loss",
    "inverse_metrics",
]
