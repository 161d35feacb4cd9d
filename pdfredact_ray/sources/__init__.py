"""Sources & sinks: synthetic transcript generation, parquet IO helpers."""
