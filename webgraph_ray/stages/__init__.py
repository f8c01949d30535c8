from webgraph_ray.stages.edges import derive_edges, EXTRA_RULES  # noqa: F401
from webgraph_ray.stages.vertices import derive_vertices, degrees  # noqa: F401
from webgraph_ray.stages.text import (  # noqa: F401
    token_stats,
    quality_scores,
    lang_id,
    doc_hashes,
    fingerprints,
)
from webgraph_ray.stages.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup,
    simhash,
    simhash_dup_pairs,
)
from webgraph_ray.stages.embed import (  # noqa: F401
    ann_topk,
    lsh_ann_topk,
    cosine_dup_pairs,
)
from webgraph_ray.stages.media import to_media, media_meta, MediaDecoder  # noqa: F401
from webgraph_ray.stages.features import (  # noqa: F401
    chain_depth,
    rule_labels,
    remap_vertices,
    tool_obfuscation_mapping,
    degree_histogram,
    convs_missing_tool,
)
