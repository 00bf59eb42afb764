from graphraft_spark.patterns.ir import NodeSpec, PatternSpec, onehop, twohop, twopath
from graphraft_spark.patterns.compiler import compile_pattern, run_pattern
from graphraft_spark.patterns.enumerate import (
    enumerate_paths,
    instantiate_queries,
)

__all__ = [
    "NodeSpec",
    "PatternSpec",
    "onehop",
    "twohop",
    "twopath",
    "compile_pattern",
    "run_pattern",
    "enumerate_paths",
    "instantiate_queries",
]
