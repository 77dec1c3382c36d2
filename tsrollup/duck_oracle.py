"""DuckDB oracle support: Spark-exact xxhash64 in pure SQL.

The engine's sequence table derives from `documents` via Spark's
`xxhash64` (event_ts = seeded spread of doc_id; token ids = hashed
words — flagship.sequences_from_documents, storage.resolve_event_time).
A DuckDB oracle can therefore only re-derive the SAME rows if it can
evaluate xxhash64 itself. This module expresses XXH64 (Yann Collet's
public xxHash64 algorithm; Spark's `xxhash64` is XXH64 with seed 42 over
the UTF-8 bytes) as pure DuckDB SQL macros:

- 64-bit wrapping arithmetic in HUGEINT with explicit mod 2^64; the
  wrapping multiply splits operands into 32-bit halves.
- Every stage is let-bound through single-element `list_transform`
  lambdas so each intermediate value is computed exactly once (naive
  macro composition re-evaluates arguments exponentially).
- `xxh64(s)` covers byte lengths < 32 (no 32-byte stripe phase) and
  returns NULL beyond — the fixtures' doc_ids and whitespace words are
  <= 8 bytes (asserted in tests), and a violated precondition surfaces
  as a NULL-driven mismatch, never a silently wrong hash.

Byte-for-byte agreement with `F.xxhash64` (and `F.pmod` composition) is
pinned by tests/test_duck_oracle.py across lengths 0..31, unicode, and
every word of the sf0.01 fixture.
"""

from __future__ import annotations

#: seconds in the 30-day event-time spread window (storage.resolve_event_time)
EVENT_SPAN_S = 30 * 86400
EVENT_EPOCH_S = 1704067200

XXH64_PRELUDE = r"""
CREATE OR REPLACE MACRO xxmul(aa, bb) AS
  (list_transform([aa], x -> list_transform([bb], y ->
    ( (x % 4294967296) * (y % 4294967296)
    + ((((x // 4294967296) * (y % 4294967296)
        + (x % 4294967296) * (y // 4294967296)) % 4294967296) * 4294967296)
    ) % 18446744073709551616)[1])[1]);
CREATE OR REPLACE MACRO xxrotl(v, p, q) AS
  (list_transform([v], x ->
    ((x * p) % 18446744073709551616) + (x // q))[1]);
CREATE OR REPLACE MACRO xxxor(a, b) AS
  (xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT))::HUGEINT);
CREATE OR REPLACE MACRO xxround0(k) AS
  (xxmul(xxrotl(xxmul(k, 14029467366897019727), 2147483648, 8589934592),
         11400714785074694791));
CREATE OR REPLACE MACRO xxbytes(s) AS
  (list_transform([hex(encode(s))], hx ->
     list_transform(range(length(hx) // 2),
       i -> (('0x' || substr(hx, 1 + 2*i, 2))::UBIGINT)::HUGEINT))[1]);
CREATE OR REPLACE MACRO xxle64(b, o) AS
  (b[o::BIGINT+1]::HUGEINT + b[o::BIGINT+2]::HUGEINT*256
   + b[o::BIGINT+3]::HUGEINT*65536 + b[o::BIGINT+4]::HUGEINT*16777216
   + b[o::BIGINT+5]::HUGEINT*4294967296 + b[o::BIGINT+6]::HUGEINT*1099511627776
   + b[o::BIGINT+7]::HUGEINT*281474976710656
   + b[o::BIGINT+8]::HUGEINT*72057594037927936);
CREATE OR REPLACE MACRO xxle32(b, o) AS
  (b[o::BIGINT+1]::HUGEINT + b[o::BIGINT+2]::HUGEINT*256
   + b[o::BIGINT+3]::HUGEINT*65536 + b[o::BIGINT+4]::HUGEINT*16777216);
CREATE OR REPLACE MACRO xxh64u(s) AS
  (list_transform([xxbytes(s)], b ->
    list_transform([len(b)::HUGEINT], n ->
     CASE WHEN n >= 32 THEN NULL ELSE
      list_transform([list_reduce(
          list_prepend((42 + 2870177450012600261 + n) % 18446744073709551616,
            list_transform(range((n // 8)::BIGINT), w -> xxle64(b, w * 8))),
          (a, k) -> ((xxmul(xxrotl(xxxor(a, xxround0(k)),
                                   134217728, 137438953472),
                            11400714785074694791)
                      + 9650029242287828579) % 18446744073709551616))], h1 ->
       list_transform([CASE WHEN (n % 8) >= 4 THEN
           (xxmul(xxrotl(xxxor(h1, xxmul(xxle32(b, n - (n % 8)),
                                         11400714785074694791)),
                         8388608, 2199023255552), 14029467366897019727)
            + 1609587929392839161) % 18446744073709551616
         ELSE h1 END], h2 ->
        list_transform([list_reduce(
            list_prepend(h2, b[(n - (n % 4))::BIGINT + 1 : n::BIGINT]),
            (a, c) -> xxmul(xxrotl(xxxor(a, xxmul(c, 2870177450012600261)),
                                   2048, 9007199254740992),
                            11400714785074694791))], h3 ->
         list_transform([xxmul(xxxor(h3, h3 // 8589934592),
                               14029467366897019727)], a1 ->
          list_transform([xxmul(xxxor(a1, a1 // 536870912),
                                1609587929392839161)], a2 ->
            xxxor(a2, a2 // 4294967296))[1])[1])[1])[1])[1]
     END)[1])[1]);
CREATE OR REPLACE MACRO xxh64(s) AS
  (list_transform([xxh64u(s)], u ->
     CASE WHEN u >= 9223372036854775808
          THEN (u - 18446744073709551616)::BIGINT
          ELSE u::BIGINT END)[1]);
CREATE OR REPLACE MACRO xxpmod(h, m) AS
  (((((h)::HUGEINT % (m)) + (m)) % (m))::BIGINT);
CREATE OR REPLACE MACRO xxav1(h) AS
  (xxmul(xxxor(h, h // 8589934592), 14029467366897019727));
CREATE OR REPLACE MACRO xxav2(h) AS
  (xxmul(xxxor(h, h // 536870912), 1609587929392839161));
CREATE OR REPLACE MACRO xxfin(h) AS (xxxor(h, h // 4294967296));
-- Spark xxhash64 over ARRAY<INT>: Catalyst folds hash = hashInt(elem, hash)
-- over the elements with initial seed 42; hashInt(i, seed) =
-- fmix(rotl23((seed + P5 + 4) xor (u32(i) * P1)) * P2 + P3)
CREATE OR REPLACE MACRO xxhint_step(a, e) AS
  (xxfin(xxav2(xxav1(
     (xxmul(xxrotl(xxxor((a + 2870177450012600265) % 18446744073709551616,
                         xxmul((e + 4294967296) % 4294967296,
                               11400714785074694791)),
                   8388608, 2199023255552), 14029467366897019727)
      + 1609587929392839161) % 18446744073709551616))));
CREATE OR REPLACE MACRO xxh64_intlist(l) AS
  (list_transform([list_reduce(
      list_prepend(42::HUGEINT, list_transform(l, e -> e::HUGEINT)),
      (a, e) -> xxhint_step(a, e))], u ->
     CASE WHEN u >= 9223372036854775808
          THEN (u - 18446744073709551616)::BIGINT ELSE u::BIGINT END)[1]);
"""

#: CTE reconstructing the engine's sequence table from the `documents`
#: view, row-for-row identical to flagship.sequences_from_documents +
#: storage.resolve_event_time (VOCAB = 50257 there; spread = 30 days).
SEQ_CTE = f"""
seq AS (
  SELECT doc_id::VARCHAR AS doc_id,
         list_transform(string_split(lower(text), ' '),
                        w -> xxpmod(xxh64(w), 50257)) AS tokens,
         len(string_split(lower(text), ' '))::BIGINT AS n_tok,
         source,
         make_timestamp(({EVENT_EPOCH_S}
             + xxpmod(xxh64(doc_id::VARCHAR), {EVENT_SPAN_S})) * 1000000)
           AS event_ts
  FROM documents
)
"""


def engine_oracle(body: str, recursive: bool = False) -> str:
    """Compose a full oracle statement: xxh64 macro prelude (multi-
    statement; DuckDB returns the trailing SELECT's relation) + the seq
    CTE + the query body. `body` must start with its own CTE list or a
    SELECT that references `seq`. `recursive=True` opens the CTE list
    with WITH RECURSIVE so the body may include recursive CTEs (the
    EWMA-recurrence twins need one)."""
    kw = "WITH RECURSIVE " if recursive else "WITH "
    return XXH64_PRELUDE + "\n" + kw + SEQ_CTE + body
