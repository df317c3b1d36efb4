"""Compute kernels: splines, stencil operators, gather/scatter, ECSIM blocks."""
