"""sifr_project_java_ontology_processing_ray — Ray-Data-native KG construction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the reference repo (gsanou/sifr_project_java_ontology_processing, a Java/Jena
ontology-enrichment toolchain) as an idiomatic ``ray.data.Dataset`` streaming
DAG over Arrow batches, applied to Common-Crawl-style web-page tables.

Subpackages
-----------
- ``functions``: pure, vectorizable kernels (text extraction, codes, hashing,
  similarity, quality) — no Ray dependency.
- ``stages``: ``map_batches`` callables (stateless fns and stateful actor
  classes) that wrap the kernels.
- ``sources``: readers/builders for the input tables (pages, CSV dictionary /
  corpus, NCBO XML, RDF-ish triples).
- ``pipelines``: end-to-end DAGs (flagship KG construction, ontology
  enrichment cascade, SKOS generation, relational query suite).
- ``state``: broadcast tables, union-find, partition manifests / resume.

None of this package calls ``ray.init()`` — the caller owns the session.
"""

__version__ = "0.1.0"
