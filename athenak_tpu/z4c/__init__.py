"""Z4c numerical relativity."""
