"""Control-plane semantics of the reference, re-expressed as data-driven
rule tables + vectorized kernels (see SURVEY.md section 2)."""
