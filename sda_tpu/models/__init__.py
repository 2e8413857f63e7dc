"""End-to-end aggregation workload models (the frameworks's "model zoo").

The reference's workloads are aggregation configurations, not neural nets;
each model here is a compiled end-to-end pipeline for one configuration
family (scheme x masking x field width), the unit the benchmarks and the
multi-chip dryrun drive.
"""

from sda_tpu.models.federated import FederatedAggregation

__all__ = ["FederatedAggregation"]
