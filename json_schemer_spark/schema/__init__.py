"""Schema compilation + evaluation (driver-side plan, executor-side batches)."""
