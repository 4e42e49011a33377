"""Engine scalar-function helpers shared across operator modules."""
