"""Command-line drivers: training/eval and evolutionary search."""
