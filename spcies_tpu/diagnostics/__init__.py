from spcies_tpu.diagnostics.timing import PhaseTimer

__all__ = ["PhaseTimer"]
