"""vstab utils package."""
