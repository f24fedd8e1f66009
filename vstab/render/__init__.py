"""vstab render package."""
