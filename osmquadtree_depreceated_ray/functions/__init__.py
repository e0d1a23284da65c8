"""Pure vectorized kernels (numpy / pyarrow.compute) — no Ray imports here."""
