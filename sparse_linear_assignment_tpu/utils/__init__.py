from .trace import profile_solve, set_debug, trace_round
