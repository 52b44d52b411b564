"""Profile the flagship FNO-2D DR training step: where do the 0.26 ms go?

Times each stage separately (forward only, forward+backward, full
optimizer step, window gather alone) and the spectral-conv layer in
isolation at the production shape, for both impls (partial-DFT vs FFT)
and precisions.  Optionally dumps a jax.profiler trace for perfetto.

Decides whether a fused Pallas spectral-conv kernel is worth building
(ROADMAP item: "einsum chain is already MXU-bound — measure first").
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=200, warmup=20):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--width", type=int, default=20)
    p.add_argument("--modes", type=int, default=12)
    p.add_argument("--trace-dir", default="")
    a = p.parse_args(argv)

    from sciml_pde_tpu.models import FNO2d
    from sciml_pde_tpu.ops.spectral import spectral_conv_2d, spectral_weight_init

    rng = np.random.default_rng(0)
    b, nx, c = a.batch, a.size, 2
    x = jnp.asarray(rng.normal(size=(b, nx, nx, 10, c)).astype(np.float32))
    gx, gy = np.meshgrid(np.linspace(-1, 1, nx), np.linspace(-1, 1, nx), indexing="ij")
    grid = jnp.asarray(
        np.broadcast_to(np.stack([gx, gy], -1)[None], (b, nx, nx, 2)).astype(np.float32)
    )
    model = FNO2d(num_channels=c, modes1=a.modes, modes2=a.modes, width=a.width,
                  initial_step=10)
    params = model.init(jax.random.PRNGKey(0), x, grid)["params"]

    fwd = jax.jit(lambda p, x, g: model.apply({"params": p}, x, g))
    loss = jax.jit(lambda p, x, g: jnp.sum(model.apply({"params": p}, x, g) ** 2))
    grad = jax.jit(jax.grad(lambda p, x, g: jnp.sum(model.apply({"params": p}, x, g) ** 2)))

    print(f"model fwd:      {timeit(fwd, params, x, grid)*1e3:.3f} ms")
    print(f"model fwd+bwd:  {timeit(grad, params, x, grid)*1e3:.3f} ms")

    # spectral layer in isolation (width-channel input, the hot shape)
    xs = jnp.asarray(rng.normal(size=(b, nx, nx, a.width)).astype(np.float32))
    w1 = spectral_weight_init(jax.random.PRNGKey(1), a.width, a.width, a.modes, a.modes)
    w2 = spectral_weight_init(jax.random.PRNGKey(2), a.width, a.width, a.modes, a.modes)
    for impl in ("dft", "fft"):
        f = jax.jit(lambda x, w1, w2, impl=impl: spectral_conv_2d(
            x, w1, w2, a.modes, a.modes, impl=impl))
        try:
            t = timeit(f, xs, w1, w2)
            print(f"spectral_conv_2d[{impl}] fwd: {t*1e3:.3f} ms")
        except Exception as e:  # fft impl may not lower on some runtimes
            print(f"spectral_conv_2d[{impl}]: {type(e).__name__}")

    # pointwise-conv + gelu (the other per-layer cost)
    wdense = jnp.asarray(rng.normal(size=(a.width, a.width)).astype(np.float32))
    pw = jax.jit(lambda x, w: jax.nn.gelu(x @ w))
    print(f"1x1 conv+gelu fwd: {timeit(pw, xs, wdense)*1e3:.3f} ms")

    if a.trace_dir:
        with jax.profiler.trace(a.trace_dir):
            for _ in range(20):
                out = grad(params, x, grid)
            jax.block_until_ready(out)
        print(f"trace written to {a.trace_dir}")


if __name__ == "__main__":
    main()
