"""Sources: synthetic tokenized-sequences generator + table-layer abstraction
(Parquet in the sandbox, Iceberg on the cluster)."""
