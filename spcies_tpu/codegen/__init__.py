from spcies_tpu.codegen.emit_c import generate_c_solver, clear_generated
from spcies_tpu.codegen.cbridge import CompiledCSolver

__all__ = ["generate_c_solver", "clear_generated", "CompiledCSolver"]
