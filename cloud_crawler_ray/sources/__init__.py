"""Table storage: Lance-style versioned parquet fragments + frontier store."""
