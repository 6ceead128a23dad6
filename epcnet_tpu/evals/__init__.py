"""L3 evaluation: batch embedding, (sharded) retrieval, recall@N metrics,
latency probes (SURVEY.md §3.2)."""

from epcnet_tpu.evals.recall import (
    embed_entries,
    get_recall,
    evaluate_region,
    evaluate_dataset,
    retrieval_latency_probe,
)

__all__ = [
    "embed_entries",
    "get_recall",
    "evaluate_region",
    "evaluate_dataset",
    "retrieval_latency_probe",
]
