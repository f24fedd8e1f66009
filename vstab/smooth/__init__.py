"""vstab smooth package."""
