"""Pipeline configuration.

Defaults mirror the reference sketch configuration (k=16, sketch=16,
window=128, stride=113 — /root/reference/src/mode_build.cpp:65-68,111)
re-targeted at webtext: k-character shingles instead of k-mers, whole-doc
signatures instead of per-genomic-window sketches (the graft's "window"
is the document; see SURVEY.md §7.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- sketching (reference parity: src/hash_dna.h defaults k=16, s=16)
    shingle_k: int = 16          # characters per shingle (ref: kmer k)
    sketch_size: int = 16        # signature width s (ref: sketchSize)

    # --- LSH banding over the s-wide signature
    # 8 bands × 2 rows: threshold (1/b)^(1/r) ≈ 0.35.  At the verify
    # threshold τ=0.6 the banding miss probability is (1-0.6²)^8 ≈ 0.018
    # and falls below 1e-3 by J≈0.72 — sized for the ≥0.99 dup-pair
    # recall gate at the planted near-dup mutation rates (FIXTURES.md).
    bands: int = 8               # b
    rows_per_band: int = 2       # r ; b*r == sketch_size
    # similarity threshold for verified duplicate pairs (exact Jaccard
    # on character shingle sets).
    jaccard_threshold: float = 0.6

    # --- skew / stop-feature controls
    # Cap on docs per (band, bucket) before the self-join; buckets larger
    # than this are dropped as non-discriminative boilerplate — the
    # overpopulated-feature removal analog
    # (/root/reference/src/sketch_database.h:375-395, docs/build.txt:46-50).
    max_docs_per_bucket: int = 254   # ref: loclist cap 254
    # What to do with buckets LARGER than the cap:
    # - "drop": discard them as non-discriminative boilerplate (the
    #   reference's overpopulated-feature removal — its recall trade-off
    #   too: a NEAR-identical mega-cluster larger than the cap, e.g. a
    #   page mirrored 10^5 times with per-mirror footers, loses every
    #   LSH pair and never clusters; only byte-identical copies fall to
    #   the exact lane).
    # - "sample": keep a deterministic xxhash-ordered cap-sized subset
    #   (the reference's insert-time 254-cap analog; members outside
    #   every band's sample still get no pairs).
    # - "star": oversized buckets emit HUB edges (bucket-min id,
    #   member) instead of all pairs — O(n) edges via a groupBy().min()
    #   plus a shuffle-hash join-back (NOT a window-min: a window over
    #   the bucket would buffer the whole mega-bucket in one task;
    #   lsh.py::_star_edges documents the shape), so a 10^7-member
    #   bucket costs 10^7 rows spread over its shuffle partitions,
    #   never n²/2 in one task.
    #   Every member stays reachable from the hub, so after per-pair
    #   verification connected components glues true mega-clusters at
    #   recall 1.0, while chance collisions still die at the verify
    #   gate (precision unchanged).  Extra cost is bounded: ≤ n verify
    #   candidates per oversized bucket, most rejected JVM-side by the
    #   min_sig_lanes prefilter before any text compare.
    oversize_policy: str = "drop"

    # --- candidate thresholds (ref: hitsMin = sketchLen/3 deduced,
    # /root/reference/src/mode_query.cpp:247-260)
    min_band_hits: int = 1
    # JVM-side signature-estimate prefilter before text verification:
    # a candidate pair must share ≥ this many MinHash lanes (the
    # reference's hitsMin-on-sketch-hits discipline re-applied to the
    # webtext lane; s//4 is conservative vs the reference's s/3).
    # E[shared lanes] = J·s, so at s=16 a true J=0.6 pair fails
    # P(Binom(16,0.6) ≤ 3) ≈ 9e-4 — inside the ≥0.99 recall budget —
    # while a boilerplate J≈0.1 collision survives only with p≈0.007:
    # ~99% of false candidates never reach the per-pair text verify.
    # Fingerprint-lane candidates bypass (substring dups have low
    # Jaccard by design).  0 disables.
    min_sig_lanes: int = 4

    # --- suffix/substring verify pass
    min_substring_overlap: int = 2000  # chars (FIXTURES.md 'substring' kind)
    # winnowing window (shingles); guarantees a shared fingerprint for
    # verbatim overlaps ≥ winnow_w + shingle_k - 1 chars ≪ the 2000-char
    # substring-dup definition, so candidate recall for that lane is 1.0
    winnow_w: int = 500
    # minimum shared winnow fingerprints for a substring candidate: a
    # true ≥2000-char overlap is guaranteed to share
    # floor((2000-(w+k-1))/w)+1 = 3 fingerprints at w=500 — so 3 keeps
    # lane recall at 1.0 while pruning boilerplate pairs (which share at
    # most the 2 header/footer fingerprints) before the LCS verify.
    min_fp_hits: int = 3

    # --- hashing seeds for the k-permutation MinHash lanes
    minhash_seed: int = 0x9E3779B9

    # --- sketch lane selection
    # "kperm": production lane — Arrow-batched k-permutation MinHash
    #   (integer lanes, xxhash64 band buckets).
    # "md5": oracle lane — per-lane min of md5(lane ':' shingle) as hex
    #   STRINGS, computed entirely in Catalyst expressions with
    #   concat-string band buckets.  Byte-identical to ANSI SQL a DuckDB
    #   oracle can run (the sketch_rows_md5 discipline from the genomic
    #   lifecycle applied to the dedup pipeline); the substring/winnow
    #   lane is inert in this mode (fps = null).
    sketch_mode: str = "kperm"

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.sketch_size:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal sketch_size ({self.sketch_size})"
            )
        if self.sketch_mode not in ("kperm", "md5"):
            raise ValueError(f"unknown sketch_mode {self.sketch_mode!r}")
        if self.oversize_policy not in ("drop", "sample", "star"):
            raise ValueError(
                f"unknown oversize_policy {self.oversize_policy!r}"
            )


DEFAULT_CONFIG = DedupConfig()
