from sciml_pde_tpu.eval.rollout import rollout_predict, evaluate_rollout

__all__ = ["rollout_predict", "evaluate_rollout"]
