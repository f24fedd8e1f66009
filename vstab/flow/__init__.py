"""vstab flow package."""
