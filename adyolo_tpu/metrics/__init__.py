"""DCASE SELD evaluation metrics."""
