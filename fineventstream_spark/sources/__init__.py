"""Ring-[R] sources: polling source adapters (SURVEY §2.1 S1/S2)."""
