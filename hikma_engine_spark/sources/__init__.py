# source/sink adapters (parquet now; Iceberg gated behind import-try)
