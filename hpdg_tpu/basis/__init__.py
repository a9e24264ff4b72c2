"""Local (per-element) polynomial bases and global hp function spaces."""
