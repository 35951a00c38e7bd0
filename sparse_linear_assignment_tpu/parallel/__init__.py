from .sharded import solve_sharded_khosla, sharded_khosla_core
