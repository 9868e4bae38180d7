"""Train / eval / infer engine and experiment management."""
