"""fhir_data_validation_ray — a Ray-Data-native schema + constraint validation
engine over tables of interleaved text + media documents.

A from-scratch reimplementation of the *semantics* of the reference
``TuNguyenSynapxe/fhir-data-validation`` (a .NET 8 request/response FHIR
validation service) as a distributed, columnar, Ray Data pipeline:

- one document  = one row ``(doc_id: string, spans: list<struct<kind, text,
  media_ref, offset>>)`` — the analogue of one FHIR Bundle
  (reference: ``docs/04_data_inputs_spec.md:13-18``);
- a validation profile (rules.json analogue, ``Models/RuleSet.cs:10-129``)
  compiles once per actor into vectorized Arrow/numpy predicate kernels;
- violations are a second Dataset with the unified error model
  (``Models/ValidationError.cs:9-100``).

Layout:
    profile.py    rule-set model + compile-time validation
    errors.py     error codes / severities / violation schema
    functions/    pure vectorized kernels (no Ray imports)
    stages/       Ray Data stages (validator actor pool, shuffle stages)
    sources/      readers + the deterministic fixture generator
    state/        mergeable sketches (t-digest, HLL), checkpoints, drift
    pipelines/    end-to-end pipeline orchestration
"""

__version__ = "0.2.0"
