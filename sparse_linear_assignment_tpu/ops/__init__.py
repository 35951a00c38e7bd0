from .padded import PaddedProblem, build_padded_problem
