"""De Bruijn graph construction, contraction, coverage, simplification."""
