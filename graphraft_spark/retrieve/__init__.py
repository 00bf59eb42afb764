from graphraft_spark.retrieve.budget import (
    budgeted_accumulate,
    vector_topup,
    retrieve_data,
)

__all__ = ["budgeted_accumulate", "vector_topup", "retrieve_data"]
