"""Pure (Ray-free) kernels: rule compilation, tokenization, matching, masking.

Every function in this package is deterministic and side-effect free; the
Ray stages in ``pdfredact_ray.stages`` call these per batch, and the pytest
oracle calls them per turn.
"""
