from graphraft_spark.sources.hf_arrow_source import (
    HFArrowDataSource,
    read_hf_split_distributed,
    write_hf_dataset_distributed,
    write_hf_split_distributed,
)

__all__ = ["HFArrowDataSource", "read_hf_split_distributed",
           "write_hf_dataset_distributed", "write_hf_split_distributed"]
