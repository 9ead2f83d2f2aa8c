"""Unicode text normalization lanes — NFC composition and accent
folding for corpus canonicalization.

Web text arrives in mixed normalization forms: 'café' appears both
composed (U+00E9) and decomposed (e + U+0301), and the two spellings
hash differently, so EVERY downstream exact/fuzzy dedup, fingerprint
and token statistic silently treats them as distinct documents unless a
normalization pass runs first. The standard corpus recipe is NFC for
canonical equivalence plus an accent-folded lowercase lane for
matching/fingerprinting (the `strip_accents` of Lucene/DuckDB).

Spark has no built-in Unicode-normalization expression, so this is one
of the repo's few legitimate Python lanes (same justification as the
SRP encoder, operators/similarity.py): Arrow-batched mapInPandas, one
`unicodedata` pass per row, no shuffle — a pure projection. The DuckDB
oracle recomputes both lanes with its native `nfc_normalize` /
`strip_accents`, making this a real cross-engine check of the
normalization itself (ICU-compatible behavior agreed on the planted
alphabet; locale-sensitive edge cases — Turkish dotted I, German sharp
s casefolding — are documented out of the fixture's alphabet).

No reference-repo counterpart (the pandas reference normalizes numbers,
not text — src/transform.py:30-62); training-pipeline extension.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fold(nfc: str) -> str:
    """Accent-strip (NFD, drop combining marks) then lowercase —
    byte-for-byte what DuckDB's strip_accents + lower compute."""
    import unicodedata

    stripped = "".join(
        c
        for c in unicodedata.normalize("NFD", nfc)
        if not unicodedata.combining(c)
    )
    return stripped.lower()


def normalize_text_lanes(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, nfc, folded, changed): NFC-composed text, the accent-folded
    lowercase matching lane, and whether NFC changed the raw bytes
    (the mixed-normalization detection signal). NULL text passes
    through as NULL lanes."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    out_schema = f"{id_col} long, nfc string, folded string, changed boolean"

    def lanes(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import unicodedata

        import pandas as pd

        for b in batches:
            ids, nfcs, folds, changed = [], [], [], []
            for i, t in zip(b[id_col], b[text_col]):
                ids.append(i)
                if t is None:
                    nfcs.append(None)
                    folds.append(None)
                    changed.append(None)
                    continue
                n = unicodedata.normalize("NFC", t)
                nfcs.append(n)
                folds.append(_fold(n))
                changed.append(n != t)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "nfc": nfcs,
                    "folded": folds,
                    "changed": changed,
                }
            )

    return df.select(id_col, text_col).mapInPandas(lanes, out_schema)


def normalized_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp): md5 of the folded lane — the dedup key that makes
    composed/decomposed/case/accent variants of the same text collide.
    The hash itself runs JVM-side; Python only folds."""
    lanes = normalize_text_lanes(df, id_col, text_col)
    return lanes.select(id_col, F.md5(F.col("folded")).alias("fp"))
