"""vstab eval package."""
