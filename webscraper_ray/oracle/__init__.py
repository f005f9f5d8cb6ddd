"""Single-process oracle implementing the reference's exact semantics.

Pure Python, no Ray. Every distributed stage in ``webscraper_ray.stages`` /
``webscraper_ray.pipelines`` is validated against these functions; the
per-row invariant (BASELINE.json input_hint) is byte-identical extracted
text per url between the Ray pipeline and this oracle.
"""
