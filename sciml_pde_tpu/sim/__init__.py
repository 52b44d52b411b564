from sciml_pde_tpu.sim.diff_react import DiffReactConfig, simulate_diff_react

__all__ = ["DiffReactConfig", "simulate_diff_react"]
