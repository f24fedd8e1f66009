"""vstab io package."""
