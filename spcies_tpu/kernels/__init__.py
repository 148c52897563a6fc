from spcies_tpu.kernels.band_chol import band_chol_solve, beta_inverses

__all__ = ["band_chol_solve", "beta_inverses"]
