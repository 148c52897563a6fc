from spcies_tpu.runtime.rollout import closed_loop_rollout

__all__ = ["closed_loop_rollout"]
