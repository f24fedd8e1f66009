"""vstab dist package."""
