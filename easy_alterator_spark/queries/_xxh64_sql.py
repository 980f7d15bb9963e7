"""DuckDB SQL generator reproducing Spark's ``xxhash64`` bit-for-bit.

Closes the last closable no-oracle gap (`dedup_simhash`): the
production SimHash path hashes tokens with Spark's JVM-native
``xxhash64``, which DuckDB has no built-in twin for — so this module
*generates* a chained-CTE SQL fragment that evaluates the standard
XXH64 algorithm (Collet's public xxHash, the exact variant Spark's
``XxHash64`` expression implements: byte-stream hash of the UTF-8
token with seed 42, then the per-word int argument hashed with the
string hash as seed) entirely in DuckDB arithmetic.

Engineering constraints this design answers:

- DuckDB BIGINT/UBIGINT arithmetic raises on overflow, so all mod-2^64
  arithmetic runs in HUGEINT (int128). A full 64x64 multiply can reach
  2^128 and overflow int128, so every multiply is a 32-bit split:
  ``a*b mod 2^64 = (alo*blo + ((alo*bhi + ahi*blo) mod 2^32) << 32)
  mod 2^64`` — every intermediate < 2^65.
- Rotations are exact as ``(x mod 2^(64-r)) * 2^r + x div 2^(64-r)``
  (the two parts occupy disjoint bit ranges, so plain + is the OR).
- ``xor()`` is DuckDB-native on HUGEINT.
- The fold over a token's 8-byte little-endian words is
  ``list_reduce(list_prepend(h0, words), step)`` — list_reduce seeds
  from the first element, so prepending the running hash makes it a
  proper initialized fold; CTE stages keep each generated expression
  small (the only textual blowup is fixed-depth operator nesting).
- Tokens must be ASCII (code point == UTF-8 byte — true of the
  fixture corpus, all [a-y]) and < 32 bytes (the fixture max is 8),
  which keeps the single-lane path sufficient; both assumptions fail
  LOUDLY via ``error()`` guards instead of hashing wrong. The md5
  bit-schedule twin (`dedup_simhash_md5`) remains the
  arbitrary-input differential oracle.

Semantics source: the public xxHash spec / Apache Spark's
``sql/catalyst`` ``XxHash64`` + ``XXH64.java`` behavior, verified
bit-for-bit against ``F.xxhash64`` in tests/test_round9_ops.py over
fixture tokens and adversarial lengths (0..31, all tail-path
combinations).
"""

from __future__ import annotations

_M64 = "18446744073709551616::HUGEINT"
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _mul(a: str, b: int) -> str:
    """(a * b) mod 2^64; b literal; int128-safe 32-bit split."""
    blo, bhi = b & 0xFFFFFFFF, b >> 32
    alo = f"(({a}) % 4294967296::HUGEINT)"
    ahi = f"(({a}) // 4294967296::HUGEINT)"
    return (
        f"(({alo} * {blo}::HUGEINT + (({alo} * {bhi}::HUGEINT"
        f" + {ahi} * {blo}::HUGEINT) % 4294967296::HUGEINT)"
        f" * 4294967296::HUGEINT) % {_M64})"
    )


def _rotl(x: str, r: int) -> str:
    lo, hi = 1 << (64 - r), 1 << r
    return (
        f"((({x}) % {lo}::HUGEINT) * {hi}::HUGEINT"
        f" + ({x}) // {lo}::HUGEINT)"
    )


def _shr(x: str, r: int) -> str:
    return f"(({x}) // {1 << r}::HUGEINT)"


def _xor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def _add(a: str, b: int) -> str:
    return f"((({a}) + {b}::HUGEINT) % {_M64})"


def _round0(k: str) -> str:
    # XXH64 round(0, k) = rotl31(k * PRIME2) * PRIME1
    return _mul(_rotl(_mul(k, _P2), 31), _P1)


def _word_step(acc: str, k: str) -> str:
    # acc = rotl27(acc ^ round(0, k)) * PRIME1 + PRIME4
    return _add(_mul(_rotl(_xor(acc, _round0(k)), 27), _P1), _P4)


def _four_step(h: str, k4: str) -> str:
    # h = rotl23(h ^ (k4 * PRIME1)) * PRIME2 + PRIME3
    return _add(_mul(_rotl(_xor(h, _mul(k4, _P1)), 23), _P2), _P3)


def _byte_step(acc: str, b: str) -> str:
    # h = rotl11(h ^ (b * PRIME5)) * PRIME1
    return _mul(_rotl(_xor(acc, _mul(b, _P5)), 11), _P1)


def xxh64_word_ctes(src: str = "vocab", prefix: str = "x") -> str:
    """CTE chain fragment: input ``{src}(w)`` (ASCII tokens, len < 32);
    final CTE ``{prefix}f(w, hw)`` with hw = Spark ``xxhash64(w, 0)``
    as HUGEINT in [0, 2^64) — the per-token SimHash word hash."""
    # x0: byte list + length, with loud guards on both assumptions
    t0 = f"""{prefix}0 AS (
      SELECT w,
             CASE WHEN len(w) >= 32
                  THEN error('xxh64 oracle: token >= 32 bytes')
                  WHEN regexp_matches(w, '[^\\x01-\\x7f]')
                  THEN error('xxh64 oracle: non-ASCII token')
                  ELSE len(w)::HUGEINT END AS n,
             list_transform(regexp_extract_all(w, '.'),
                            c -> unicode(c)::HUGEINT) AS bts
      FROM {src})"""
    # x1: full 8-byte little-endian words + h0 = seed(42) + PRIME5 + n
    wordexpr = " + ".join(
        f"bts[wi * 8 + {j + 1}] * {1 << (8 * j)}::HUGEINT" for j in range(8)
    )
    t1 = f"""{prefix}1 AS (
      SELECT w, n, bts,
             list_transform(range((n // 8)::BIGINT),
                            wi -> {wordexpr}) AS wds,
             {_add("n", 42 + _P5)} AS h0
      FROM {prefix}0)"""
    t2 = f"""{prefix}2 AS (
      SELECT w, n, bts,
             list_reduce(list_prepend(h0, wds),
                         (acc, k) -> {_word_step("acc", "k")}) AS h8
      FROM {prefix}1)"""
    # x3: the single optional 4-byte chunk at offset 8*(n//8)
    k4 = " + ".join(
        f"bts[((n // 8) * 8 + {j + 1})::BIGINT] * {1 << (8 * j)}::HUGEINT"
        for j in range(4)
    )
    t3 = f"""{prefix}3 AS (
      SELECT w, n, bts,
             CASE WHEN n % 8 >= 4 THEN {_four_step("h8", f"({k4})")}
                  ELSE h8 END AS h4,
             ((n // 8) * 8 + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END)
                 AS off2
      FROM {prefix}2)"""
    # x4: fold the <= 3 remaining single bytes
    t4 = f"""{prefix}4 AS (
      SELECT w,
             list_reduce(
               list_prepend(h4, bts[(off2 + 1)::BIGINT : n::BIGINT]),
               (acc, b) -> {_byte_step("acc", "b")}) AS hb
      FROM {prefix}3)"""
    # x5..x7: avalanche of the byte-stream hash (= xxhash64(w) done)
    t5 = (f"{prefix}5 AS (SELECT w, "
          f"{_mul(_xor('hb', _shr('hb', 33)), _P2)} AS m1 FROM {prefix}4)")
    t6 = (f"{prefix}6 AS (SELECT w, "
          f"{_mul(_xor('m1', _shr('m1', 29)), _P3)} AS m2 FROM {prefix}5)")
    t7 = (f"{prefix}7 AS (SELECT w, "
          f"{_xor('m2', _shr('m2', 32))} AS hs FROM {prefix}6)")
    # x8: hashInt(0, hs): h = hs + PRIME5 + 4; h ^= 0*PRIME1 (no-op);
    # h = rotl23(h) * PRIME2 + PRIME3  — Spark's per-word seeding of
    # xxhash64(token, word_index) for word_index 0 (nbits = 64)
    t8 = f"""{prefix}8 AS (
      SELECT w, {_add(_mul(_rotl(_add("hs", _P5 + 4), 23), _P2), _P3)} AS hi0
      FROM {prefix}7)"""
    # x9..xf: avalanche of the int hash
    t9 = (f"{prefix}9 AS (SELECT w, "
          f"{_mul(_xor('hi0', _shr('hi0', 33)), _P2)} AS n1 FROM {prefix}8)")
    ta = (f"{prefix}a AS (SELECT w, "
          f"{_mul(_xor('n1', _shr('n1', 29)), _P3)} AS n2 FROM {prefix}9)")
    tf = (f"{prefix}f AS (SELECT w, "
          f"{_xor('n2', _shr('n2', 32))} AS hw FROM {prefix}a)")
    return ",\n    ".join([t0, t1, t2, t3, t4, t5, t6, t7, t8, t9, ta, tf])


def simhash_xxh64_oracle(dtoks: str, max_doc_id: int = 300,
                         max_hamming: int = 6) -> str:
    """Full `dedup_simhash` oracle: per-token xxhash64 bits (LSB
    order, exactly Spark's ``bit_get(h, i)``), per-doc strict-majority
    vote over ALL token occurrences, then all-pairs hamming — exact
    because with 8 bands over 64 bits any pair at hamming <= 7 shares
    a band (pigeonhole), so the Spark side's banded candidate stage
    loses nothing at max_hamming <= 6 and band-hash collisions only
    add candidates that the exact hamming filter removes."""
    bits = ", ".join(
        f"((hw // {1 << i}::HUGEINT) % 2)::INT" for i in range(64)
    )
    return f"""
    WITH d AS (SELECT doc_id, {dtoks} AS toks
               FROM documents WHERE doc_id <= {max_doc_id}),
    tokd AS (SELECT doc_id, unnest(toks) AS w FROM d),
    vocab AS (SELECT DISTINCT w FROM tokd),
    {xxh64_word_ctes("vocab")},
    vb AS (SELECT w, [{bits}] AS bits FROM xf),
    tb AS (SELECT doc_id, i, vb.bits[i + 1] AS b
           FROM tokd JOIN vb USING (w) CROSS JOIN range(64) r(i)),
    cnt AS (SELECT doc_id, i, SUM(b) AS c, COUNT(*) AS n
            FROM tb GROUP BY doc_id, i),
    sigtok AS (SELECT doc_id,
                      list(CASE WHEN c * 2 > n THEN 1 ELSE 0 END ORDER BY i)
                          AS bits
               FROM cnt GROUP BY doc_id),
    sig AS (SELECT d.doc_id,
                   coalesce(s.bits, list_transform(range(64), x -> 0)) AS bits
            FROM d LEFT JOIN sigtok s USING (doc_id)),
    pairs AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     len(list_filter(range(64),
                         i -> a.bits[i + 1] <> b.bits[i + 1]))::INT AS hd
              FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
    SELECT doc_id_a, doc_id_b, hd FROM pairs WHERE hd <= {max_hamming}
    """


def xxh64_long2_ctes(src: str, prefix: str = "p") -> str:
    """CTE chain fragment hashing TWO BIGINT columns exactly like
    Spark's ``xxhash64(colA, colB)``: input ``{src}`` must expose
    BIGINT columns ``la`` and ``lb`` (other columns are carried
    through); the final CTE ``{prefix}f`` adds ``h`` = the hash as
    HUGEINT in [0, 2^64). Spark chains ``hashLong`` per column with
    seed 42: h = fmix(step(seed + P5 + 8, word)) applied twice, where
    step is the XXH64 word round and fmix the avalanche — the exact
    semantics of ``XXH64.hashLong`` in Spark's catalyst. Used for
    deterministic pseudo-randomization (permutation tests, hash
    splits) that must replay bit-identically in the DuckDB oracle."""
    m64 = 1 << 64
    h0 = (42 + _P5 + 8) % m64
    u = (
        "(CASE WHEN {c} < 0 THEN {c}::HUGEINT + 18446744073709551616::HUGEINT"
        " ELSE {c}::HUGEINT END)"
    )
    t0 = (
        f"{prefix}0 AS (SELECT *, {u.format(c='la')} AS ua,"
        f" {u.format(c='lb')} AS ub FROM {src})"
    )
    t1 = (
        f"{prefix}1 AS (SELECT *, "
        f"{_word_step(f'{h0}::HUGEINT', 'ua')} AS w1 FROM {prefix}0)"
    )
    t2 = (f"{prefix}2 AS (SELECT *, "
          f"{_mul(_xor('w1', _shr('w1', 33)), _P2)} AS a1 FROM {prefix}1)")
    t3 = (f"{prefix}3 AS (SELECT *, "
          f"{_mul(_xor('a1', _shr('a1', 29)), _P3)} AS a2 FROM {prefix}2)")
    t4 = (f"{prefix}4 AS (SELECT *, "
          f"{_xor('a2', _shr('a2', 32))} AS h1 FROM {prefix}3)")
    t5 = (
        f"{prefix}5 AS (SELECT *, "
        f"{_word_step(_add('h1', _P5 + 8), 'ub')} AS w2 FROM {prefix}4)"
    )
    t6 = (f"{prefix}6 AS (SELECT *, "
          f"{_mul(_xor('w2', _shr('w2', 33)), _P2)} AS b1 FROM {prefix}5)")
    t7 = (f"{prefix}7 AS (SELECT *, "
          f"{_mul(_xor('b1', _shr('b1', 29)), _P3)} AS b2 FROM {prefix}6)")
    tf = (f"{prefix}f AS (SELECT *, "
          f"{_xor('b2', _shr('b2', 32))} AS h FROM {prefix}7)")
    return ",\n    ".join([t0, t1, t2, t3, t4, t5, t6, t7, tf])
