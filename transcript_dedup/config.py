"""Job configuration.

Mirrors the role of the reference's config.json merge
(/root/reference/src/index.ts:82-97, defaults :56-72): one plain dataclass
carried by the driver; shingle/signature parameters are the graft analogue of
``durationToleranceSeconds`` / ``duplicateScoreThreshold``
(/root/reference/config.json:93-118).

Everything here is deterministic — signatures computed by the Spark kernel and
by the pure-Python oracle share these exact parameters, which is what the
"identical shingle/signature config" clause of the recall target means.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling / MinHash ---------------------------------------------
    # banding tuned so the s-curve midpoint (1/b)^(1/r) ~= 0.29 sits well
    # below jaccard_threshold: pairs at the verify threshold are found with
    # P ~= 0.9+, while sub-0.2-Jaccard boilerplate pairs mostly don't
    # collide; the ones that do are rejected by verify and their degenerate
    # band keys are absorbed by the stop-band/salting machinery.
    shingle_k: int = 5                  # tokens per shingle
    num_perm: int = 126                 # MinHash permutations
    lsh_bands: int = 42                 # bands (lsh_bands * lsh_rows == num_perm)
    lsh_rows: int = 3                   # rows per band
    minhash_seed: int = 0x5EED_1DEA     # seeds the (a, b) permutation params

    # --- verification thresholds ------------------------------------------
    # fuzzy gate: band collision AND (est-Jaccard >= tau OR Hamming <= r).
    # est-Jaccard from full signatures is deterministic given identical
    # signatures — the oracle recomputes the same value. SimHash is the
    # *alternative* verifier (measured: true near-dup Hamming overlaps the
    # negative range, so it cannot be a conjunct).
    jaccard_threshold: float = 0.35
    # SimHash Hamming-ball radius (graft analogue of Levenshtein sim >= 0.9,
    # /root/reference/src/duplicates.ts:130-139)
    simhash_bits: int = 64
    hamming_radius: int = 6
    # length-band tolerance, analogue of duration +/- 5 s
    # (/root/reference/src/duplicates.ts:85-95, config.json:93)
    length_tolerance_frac: float = 0.2

    # --- confidence weights (reference code wins over README,
    #     /root/reference/src/duplicates.ts:60-78; SURVEY.md section 2.11) ---
    w_exact: int = 50                   # content-hash equality ~ artist+title
    w_fuzzy: int = 30                   # MinHash/SimHash ~ filename fuzzy
    w_length: int = 15                  # length band ~ duration tolerance
    w_meta: int = 5                     # role-seq agreement ~ album match
    # auto-decision confidence gate (/root/reference/src/auto-decider.ts:196;
    # default 70 rules.ts:16, user config 40 config.json:111)
    confidence_threshold: int = 40

    # --- substring detector -----------------------------------------------
    substring_gram_k: int = 24          # chars per sampled gram
    substring_mod: int = 8              # content-defined sampling: hash % mod == 0
    substring_min_len: int = 64         # docs shorter than this use the tiny-doc path

    # --- skew handling ------------------------------------------------------
    band_key_cap: int = 200             # band groups larger than this are salted
    band_salt: int = 16                 # salt fan-out for hot band keys
    band_key_drop: int = 100_000        # stop-band cutoff (logged, counted)

    # --- clustering ----------------------------------------------------------
    cc_max_iters: int = 50
    cc_checkpoint_every: int = 1        # localCheckpoint cadence (iterations)

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)

    def __post_init__(self):
        if self.lsh_bands * self.lsh_rows != self.num_perm:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal num_perm ({self.num_perm})"
            )


DEFAULT_CONFIG = DedupConfig()
