"""General-relativity support: stationary Cartesian Kerr-Schild metric."""
