"""Dataset / trajectory / mesh file I/O."""
