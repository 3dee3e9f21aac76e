"""Plan-level machinery: checkpoint/resume ledger, run lineage."""
