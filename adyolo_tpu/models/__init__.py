"""flax/linen model zoo: encoders, heads, losses."""
