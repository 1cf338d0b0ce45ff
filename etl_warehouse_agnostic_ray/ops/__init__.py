"""Large-scale training-data operators (beyond the reference's surface).

Exact/near dedup, text analysis, similarity search, multimodal plumbing
— each expressed Ray-Data-first: vectorized map_batches for per-doc
work, a single keyed shuffle only where co-location is semantically
required (LSH buckets, hash groups).
"""

from .components import (  # noqa: F401
    connected_components,
    connected_components_distributed,
    neardup_survivors,
)
from .dedup import (  # noqa: F401
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
    simhash_signatures,
)
from .multimodal import (  # noqa: F401
    parse_image_header,
    parse_wav_header,
)
from .chunk import chunk_documents  # noqa: F401
from .contamination import contamination_check, eval_shingle_set  # noqa: F401
from .quantiles import grouped_quantiles, quantiles_exact  # noqa: F401
from .redact import pii_redact  # noqa: F401
from .incdedup import HashIndex, IncrementalDeduper  # noqa: F401
from .linededup import line_dedup  # noqa: F401
from .quota import domain_quota_sample  # noqa: F401
from .sampling import hash_sample, hash_split, id_buckets  # noqa: F401
from .sessions import session_stats, sessionize  # noqa: F401
from .sketch import (  # noqa: F401
    cms_query,
    cms_sketch,
    hll_estimate,
    hll_registers,
)
from .similarity import topk_cosine  # noqa: F401
from .vocab import vocab_topk  # noqa: F401
from .text import (  # noqa: F401
    doc_fingerprint,
    gopher_rules,
    lang_id,
    quality_score,
    repetition_signals,
    token_count,
)
