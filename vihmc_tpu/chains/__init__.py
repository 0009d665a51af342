from vihmc_tpu.chains.parallel import (
    ChainSampler,
    sample_chains,
    sample_chains_chees,
    sample_chains_nuts,
    make_chain_mesh,
    shard_batch,
    shard_query,
)
from vihmc_tpu.chains.resume import sample_chains_resumable
from vihmc_tpu.chains.distributed import (
    initialize_distributed,
    global_chain_mesh,
    chains_per_host,
)
from vihmc_tpu.chains.diagnostics import (
    potential_scale_reduction,
    effective_sample_size,
    effective_sample_size_np,
    potential_scale_reduction_np,
    summarize,
    summarize_np,
    ess_bulk_np,
    ess_tail_np,
    rhat_rank_np,
)

__all__ = [
    "ChainSampler",
    "sample_chains",
    "sample_chains_chees",
    "sample_chains_nuts",
    "sample_chains_resumable",
    "make_chain_mesh",
    "shard_batch",
    "shard_query",
    "potential_scale_reduction",
    "effective_sample_size",
    "effective_sample_size_np",
    "potential_scale_reduction_np",
    "summarize",
    "summarize_np",
    "ess_bulk_np",
    "ess_tail_np",
    "rhat_rank_np",
    "initialize_distributed",
    "global_chain_mesh",
    "chains_per_host",
]
