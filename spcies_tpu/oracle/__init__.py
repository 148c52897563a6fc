from spcies_tpu.oracle.dense import (
    solve_eq_qp,
    solve_box_qp,
    laxmpc_admm_oracle,
)

__all__ = ["solve_eq_qp", "solve_box_qp", "laxmpc_admm_oracle"]
