from spcies_tpu.codegen.emit_c import (generate_c_solver,
                                       generate_c_fista_solver,
                                       clear_generated)
from spcies_tpu.codegen.cbridge import CompiledCSolver

__all__ = ["generate_c_solver", "generate_c_fista_solver",
           "clear_generated", "CompiledCSolver", "CompiledCFistaSolver"]
from spcies_tpu.codegen.cbridge import CompiledCFistaSolver  # noqa: E402,F401
