"""Plan configuration, partitioning policy, lineage/checkpointing."""
