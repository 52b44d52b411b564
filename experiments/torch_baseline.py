"""Measured torch baseline for bench.py's vs_baseline denominator.

The reference publishes NO throughput numbers (BASELINE.md), so the
">=2x H100 steps/s/chip" target needs a defensible denominator.  This
script provides the two measurable ingredients:

1. ``torch_cpu_steps_per_sec``: a faithful, independently written torch
   re-implementation of the reference's training step (FNO2d forward:
   fno/fno.py FNO2d with rfft2 spectral convs; nRMSE loss; Adam;
   clip-by-norm — NOT copied, rebuilt from the architecture constants)
   measured on THIS host's CPU, median of N steps.

2. ``algorithmic_flops_per_step``: the reference algorithm's FLOP count
   per optimizer step (analytic: FFTs at 5*N*log2(N), complex mode-mixing
   einsums at 8 real flops/MAC, pointwise convs, x3 for fwd+bwd), from
   which an analytic H100 step-rate BOUND follows:

       h100_steps_per_sec_bound = PEAK_TF32_DENSE * UTIL / flops_per_step

   using H100 SXM TF32 dense peak 494e12 flops/s and a GENEROUS
   utilization band (the reference is eager fp32 torch with cuFFT +
   small batch-4 kernels; 10%..50% brackets it, and the bound is taken
   at 50% so vs_baseline is conservative for us).

Writes experiments/results/torch_cpu_baseline.json, which bench.py reads.
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path

import numpy as np
import torch

BATCH = 4
NX = NY = 128
INITIAL_STEP = 10
CHANNELS = 2
MODES = 12
WIDTH = 20

H100_TF32_DENSE_PEAK = 494e12  # H100 SXM TF32 tensor-core dense flops/s
H100_UTIL_BAND = (0.10, 0.50)


class SpectralConv2d(torch.nn.Module):
    """Reference-equivalent spectral conv (fno/fno.py SpectralConv2d_fast
    architecture constants; written fresh)."""

    def __init__(self, cin, cout, m1, m2):
        super().__init__()
        scale = 1.0 / (cin * cout)
        self.m1, self.m2 = m1, m2
        self.w1 = torch.nn.Parameter(
            scale * torch.randn(cin, cout, m1, m2, dtype=torch.cfloat))
        self.w2 = torch.nn.Parameter(
            scale * torch.randn(cin, cout, m1, m2, dtype=torch.cfloat))

    def forward(self, x):
        b = x.shape[0]
        xf = torch.fft.rfft2(x)
        out = torch.zeros(
            b, self.w1.shape[1], x.size(-2), x.size(-1) // 2 + 1,
            dtype=torch.cfloat, device=x.device)
        out[:, :, : self.m1, : self.m2] = torch.einsum(
            "bixy,ioxy->boxy", xf[:, :, : self.m1, : self.m2], self.w1)
        out[:, :, -self.m1 :, : self.m2] = torch.einsum(
            "bixy,ioxy->boxy", xf[:, :, -self.m1 :, : self.m2], self.w2)
        return torch.fft.irfft2(out, s=(x.size(-2), x.size(-1)))


class FNO2d(torch.nn.Module):
    def __init__(self):
        super().__init__()
        cin = INITIAL_STEP * CHANNELS + 2
        self.fc0 = torch.nn.Linear(cin, WIDTH)
        self.sp = torch.nn.ModuleList(
            [SpectralConv2d(WIDTH, WIDTH, MODES, MODES) for _ in range(4)])
        self.w = torch.nn.ModuleList(
            [torch.nn.Conv2d(WIDTH, WIDTH, 1) for _ in range(4)])
        self.fc1 = torch.nn.Linear(WIDTH, 128)
        self.fc2 = torch.nn.Linear(128, CHANNELS)

    def forward(self, x, grid):
        # x: (B, X, Y, T*C); grid: (B, X, Y, 2)
        h = self.fc0(torch.cat([x, grid], dim=-1)).permute(0, 3, 1, 2)
        h = torch.nn.functional.pad(h, [0, 2, 0, 2])
        for k, (sp, w) in enumerate(zip(self.sp, self.w)):
            h2 = sp(h) + w(h)
            h = torch.nn.functional.gelu(h2) if k < 3 else h2
        h = h[..., :-2, :-2].permute(0, 2, 3, 1)
        return self.fc2(torch.nn.functional.gelu(self.fc1(h)))


def nrmse(pred, tgt):
    dims = tuple(range(1, pred.ndim))
    mse = (pred - tgt).pow(2).mean(dims)
    denom = tgt.pow(2).mean(dims) + 1e-7
    return (mse / denom).mean()


def algorithmic_flops_per_step() -> float:
    """Reference-algorithm FLOPs per optimizer step (fwd x3 for fwd+bwd)."""
    n = NX * NY
    fft_1 = 5 * n * math.log2(n)                     # one 2D c2c-equivalent
    per_layer = (
        2 * WIDTH * fft_1                            # rfft2 + irfft2, W channels
        + 2 * MODES * MODES * WIDTH * WIDTH * 8      # two mode-block einsums
        + n * WIDTH * WIDTH * 2                      # 1x1 conv
    )
    lift = n * (INITIAL_STEP * CHANNELS + 2) * WIDTH * 2
    head = n * (WIDTH * 128 + 128 * CHANNELS) * 2
    fwd = BATCH * (4 * per_layer + lift + head)
    return 3.0 * fwd


def count_ops(step_fn) -> int:
    """Dispatched aten-op count of one optimizer step (torch.profiler on
    CPU).  Each dispatched op is >=1 kernel launch on a GPU, so the count
    feeds the launch-latency bound."""
    from torch.profiler import ProfilerActivity, profile

    with profile(activities=[ProfilerActivity.CPU]) as prof:
        step_fn()
    return sum(
        e.count for e in prof.key_averages()
        if e.key.startswith("aten::") and e.cpu_parent is None
    )


def main():
    import os

    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    model = FNO2d()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    x = torch.randn(BATCH, NX, NY, INITIAL_STEP * CHANNELS)
    g = torch.randn(BATCH, NX, NY, 2)
    y = torch.randn(BATCH, NX, NY, CHANNELS)

    def step():
        opt.zero_grad(set_to_none=True)
        loss = nrmse(model(x, g), y)
        loss.backward()
        total = torch.norm(
            torch.stack([p.grad.norm(2) for p in model.parameters()]), 2)
        torch.nn.utils.clip_grad_norm_(model.parameters(), max(5.0, 0.1 * float(total)))
        opt.step()
        return float(loss)

    for _ in range(3):
        step()  # warmup
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    cpu_rate = 1.0 / med

    flops = algorithmic_flops_per_step()
    lo, hi = (H100_TF32_DENSE_PEAK * u / flops for u in H100_UTIL_BAND)
    n_ops = count_ops(step)
    # an H100 running the reference's EAGER step pays one kernel launch
    # per dispatched op; 3 us/launch is optimistic (no CUDA graphs in the
    # reference).  The honest bound is the tighter of launch and flops.
    launch_bound = 1.0 / (n_ops * 3e-6)
    h100_bound = min(hi, launch_bound)
    out = {
        "torch_cpu_steps_per_sec": cpu_rate,
        "torch_cpu_step_ms_median": med * 1000,
        "torch_cpu_step_ms_p10_p90": [
            float(np.percentile(times, 10) * 1000),
            float(np.percentile(times, 90) * 1000),
        ],
        "torch_threads": torch.get_num_threads(),
        "algorithmic_flops_per_step": flops,
        "h100_tf32_dense_peak_flops": H100_TF32_DENSE_PEAK,
        "h100_util_band": list(H100_UTIL_BAND),
        "h100_steps_per_sec_bound_band": [lo, hi],
        "aten_ops_per_step": n_ops,
        "h100_launch_bound_steps_per_sec": launch_bound,
        "h100_steps_per_sec_bound": h100_bound,
    }
    path = Path(__file__).parent / "results" / "torch_cpu_baseline.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
