from spcies_tpu.codegen.emit_c import (generate_c_solver,
                                       generate_c_fista_solver,
                                       generate_c_mpct_eadmm_solver,
                                       generate_c_hmpc_solver,
                                       clear_generated)
from spcies_tpu.codegen.cbridge import (CompiledCSolver,
                                        CompiledCFistaSolver,
                                        CompiledCMpctEadmmSolver,
                                        CompiledCHmpcSolver)

__all__ = ["generate_c_solver", "generate_c_fista_solver",
           "generate_c_mpct_eadmm_solver", "generate_c_hmpc_solver",
           "clear_generated",
           "CompiledCSolver", "CompiledCFistaSolver",
           "CompiledCMpctEadmmSolver", "CompiledCHmpcSolver"]
