"""Sources & sinks: parquet/CSV COO ingestion, Matrix Market interop,
and derived graph builders over the TPC-H-ish driver testdata."""
