"""Plan builders: pure DataFrame-in / DataFrame-out functions implementing
GraphBLAS operator semantics as Catalyst-friendly logical plans."""
