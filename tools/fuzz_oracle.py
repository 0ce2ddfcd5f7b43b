"""Adversarial-corpus differential gate.

The per-round oracle compare runs on driver-generated testdata, so a
query twin can agree there yet diverge on data shapes the generator
never emits -- exactly the class of latent bug the round-3 advisor found
in q127 (empty text: DuckDB regexp_split_to_array('') yields [''] = 1
token, Spark's CASE yields 0). This tool builds a mutated COPY of a
testdata dir with edge rows appended inside each table's schema --
empty/whitespace/single-word/repetitive text, boundary prices and
dates, a dangling foreign key, degenerate JSON props -- and re-runs the
exact check_correctness compare over it. Both engines read the same
parquet, so any FAIL is a real twin divergence, not a data bug.

Usage: python tools/fuzz_oracle.py [--extreme] [src_sf_dir] [query ...]

--extreme additionally appends top-of-lane order values (cents == 2^59
and 2^60-128, ~1e16): these stress the integer log-bucket sketch lane
(q176/q177) at its guard boundary but are OUT of the double-sum money
lanes' contract (IEEE summation order diverges at that magnitude), so
they are quarantined from the default shared corpus; CI runs the
sketch queries against them explicitly.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))


def _append_rows(src: str, dst: str, rows: list[dict]) -> None:
    table = pq.read_table(src)
    extra = pa.Table.from_pylist(rows, schema=table.schema)
    pq.write_table(pa.concat_tables([table, extra]), dst)


def build_adversarial(src_dir: str, out_dir: str, extreme: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(src_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src_dir, f), os.path.join(out_dir, f))

    import datetime

    def doc(i, text, lang="en", source="web"):
        return {
            "doc_id": 90_000_000 + i,
            "text": text,
            "lang": lang,
            "source": source,
            "n_chars": len(text) if text is not None else None,
        }

    _append_rows(
        os.path.join(src_dir, "documents.parquet"),
        os.path.join(out_dir, "documents.parquet"),
        [
            doc(1, ""),                       # the q127 class: zero tokens
            doc(2, "   "),                    # whitespace-only
            doc(3, "word"),                   # below every n-gram width
            doc(4, "a b"),                    # two tokens, no 3-gram
            doc(5, "x y z x y z x y z"),      # heavy intra-doc gram repeats
            doc(6, "the " * 200),             # one token repeated, long
            doc(7, "tab\tand\nnewline mix"),  # non-space whitespace
            doc(8, "1234 5678 9012 3456"),    # digit soup
            doc(9, None),                     # NULL text (r4: the
                                              # curation NULL-lang class)
            doc(10, "plain words with metadata gaps", lang=None, source=None),
            # r10: multibyte stress -- char-length vs byte-length lanes
            # (len/levenshtein/shingles count CHARS on both engines;
            # md5/octet lanes hash the identical UTF-8 BYTES), emoji
            # outside the BMP, CJK with no spaces, combining accents
            doc(11, "café naïve résumé 中文"
                    "文本 \U0001f600\U0001f680 éclair",
                lang="fr"),
        ],
    )

    def order(i, price, date, custkey, prio="3-MEDIUM"):
        return {
            "o_orderkey": 90_000_000 + i,
            "o_custkey": custkey,
            "o_orderstatus": "F",
            "o_totalprice": price,
            "o_orderdate": datetime.datetime.fromisoformat(date)
            if date
            else None,
            "o_orderpriority": prio,
        }

    _append_rows(
        os.path.join(src_dir, "orders.parquet"),
        os.path.join(out_dir, "orders.parquet"),
        [
            order(1, 0.0, "1995-06-15", 1),          # zero price
            order(2, 0.01, "1992-01-01", 1),         # epoch-edge year start
            order(3, 999999.99, "1998-12-31", 2),    # year end, huge price
            order(4, 100.5, "1996-02-29", 2),        # leap day
            order(5, 100.5, "1996-02-29", 90_000_077),  # DANGLING custkey
            order(6, 100.5, None, 3),                   # NULL orderdate
            order(7, None, "1997-03-03", 3),            # NULL totalprice
            order(8, 100.5, "1997-03-03", 3, prio=None),  # NULL priority
            # r7 VERDICT #8: stress the log-histogram's bin()-length vs
            # shiftleft octave parity at exact powers of two (cents =
            # round(price*100); the IEEE round-trip of each price below
            # is verified exact):
            order(9, 10485.76, "1997-05-05", 1),    # cents == 2^20 (octave edge)
            order(10, 10485.75, "1997-05-05", 1),   # cents == 2^20 - 1 (last bucket of e=19)
            order(11, 10485.77, "1997-05-05", 2),   # cents == 2^20 + 1
            # r10: NULL custkey -- per-customer windows/joins must treat
            # it as a stratum (null-safe) or drop it SYMMETRICALLY on
            # both engines (plain equi-joins); q291's final join was
            # null-safe on one side only until this row gated it
            order(12, 50.0, "1997-06-06", None),
        ]
        + (
            [
                # top-of-lane rows, EXTREME corpus only: at ~1e16 the
                # double-sum money lanes (q02/q03/q12/q33/q38/q59/q130/
                # q142) diverge by SUMMATION ORDER -- inherent to IEEE
                # doubles, no rounding rescues it, and a 10^16-cent
                # order is out of those lanes' money contract. The
                # integer sketch lane (q176/q177) is exact here and is
                # what these rows exist to stress (CI runs them via
                # --extreme in test_differential).
                order(12, 5764607523034235.0, "1997-05-05", 2),  # cents == 2^59 exactly (top octave opens)
                order(13, 11529215046068468.48, "1997-05-05", 3),  # cents == 2^60 - 128 (largest lane-safe; 2^60-1 itself ROUNDS UP past the guard and must raise -- pinned in test_sketches)
            ]
            if extreme
            else []
        ),
    )

    def cust(i, name, acctbal, seg="BUILDING"):
        return {
            "c_custkey": 90_000_000 + i,
            "c_name": name,
            "c_nationkey": 1,
            "c_acctbal": acctbal,
            "c_mktsegment": seg,
        }

    _append_rows(
        os.path.join(src_dir, "customer.parquet"),
        os.path.join(out_dir, "customer.parquet"),
        [
            cust(1, "", 0.0),                       # empty name
            cust(2, "  padded  name  ", -999.99),   # inner/outer spaces
            cust(3, "o'brien-smith jr.", 0.01),     # apostrophe + hyphen
            cust(4, "MÜLLER élan ÇELIK", 100.0),    # non-ASCII case mapping
            cust(5, "tab\there", 1e7),              # embedded tab
            cust(6, "UPPER lower MiXeD", -0.0),     # case soup + signed zero
            cust(7, None, None, seg=None),          # NULL name/bal/segment
        ],
    )

    def part_row(i, name, brand="Brand#55", ptype="STANDARD BRUSHED TIN"):
        return {
            "p_partkey": 90_000_000 + i,
            "p_name": name,
            "p_brand": brand,
            "p_type": ptype,
            "p_size": 1,
            "p_retailprice": 0.0,
        }

    _append_rows(
        os.path.join(src_dir, "part.parquet"),
        os.path.join(out_dir, "part.parquet"),
        [
            part_row(1, ""),                          # empty name
            part_row(2, "single"),                    # one token
            part_row(3, "hy-phen ap'ostrophe dot."),  # token-splitting chars
            part_row(4, "a  b   c"),                  # multi-space runs
            part_row(5, None, brand=None, ptype=None),  # NULL name/brand/type
        ],
    )

    def li(i, qty, price, disc, tax, date, flag="R"):
        return {
            "l_orderkey": 90_000_000 + i,
            "l_partkey": 1,
            "l_suppkey": 1,
            "l_linenumber": 1,
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": disc,
            "l_tax": tax,
            "l_returnflag": flag,
            "l_linestatus": "F",
            "l_shipdate": datetime.datetime.fromisoformat(date)
            if date
            else None,
        }

    _append_rows(
        os.path.join(src_dir, "lineitem.parquet"),
        os.path.join(out_dir, "lineitem.parquet"),
        [
            li(1, 0.0, 0.0, 0.0, 0.0, "1992-01-01"),       # all-zero line
            li(2, 1.0, 0.01, 1.0, 0.0, "1998-12-31"),      # 100% discount
            li(3, 50.0, 104949.5, 0.5, 0.08, "1996-02-29"),  # leap day, big
            li(4, 3.0, 33.33, 0.07, 0.02, "1995-06-17"),   # repeating-dec avg
            li(5, 1.0, 10.0, 0.0, 0.0, None),              # NULL shipdate
            li(6, None, None, None, None, "1995-06-17"),   # NULL measures
            li(7, 1.0, 10.0, 0.0, 0.0, "1995-06-17", flag=None),  # NULL flag
        ],
    )

    _append_rows(
        os.path.join(src_dir, "supplier.parquet"),
        os.path.join(out_dir, "supplier.parquet"),
        [
            # NULL name/balance + a dangling nation key: dim-side joins
            # must neither fabricate nor silently multiply rows
            {"s_suppkey": 90_000_001, "s_name": None,
             "s_nationkey": 77, "s_acctbal": None},
            {"s_suppkey": 90_000_002, "s_name": "null-nation supplier",
             "s_nationkey": None, "s_acctbal": 10.0},
        ],
    )

    def vec(i, embedding, label=0):
        return {"vec_id": 90_000_000 + i, "embedding": embedding, "label": label}

    _append_rows(
        os.path.join(src_dir, "embeddings.parquet"),
        os.path.join(out_dir, "embeddings.parquet"),
        [
            vec(1, [0.0] * 64),                      # zero norm: cosine x/0
            vec(2, [1e-30] * 64),                    # denormal-ish tiny norm
            vec(3, [1e6] * 64, label=1),             # huge magnitude
            vec(4, [1.0] + [0.0] * 63, label=2),     # axis-aligned unit
            vec(5, [-1.0] * 64, label=3),            # all-negative
            vec(6, None),                            # NULL vector
            vec(7, [0.5] * 64, label=None),          # NULL label
        ],
    )

    def event(i, ts, etype, value, props, user=None):
        return {
            "event_id": 90_000_000 + i,
            "ts": datetime.datetime.fromisoformat(ts) if ts else None,
            "user_id": (90_000_000 + (i % 2)) if user is None else (
                None if user == 0 else user
            ),
            "event_type": etype,
            "value": value,
            "props": props,
        }

    _append_rows(
        os.path.join(src_dir, "events.parquet"),
        os.path.join(out_dir, "events.parquet"),
        [
            event(1, "2024-01-01 00:00:00", "view", 0.0, "{}"),
            event(2, "2024-01-01 00:00:00.000001", "click", -1.5,
                  '{"k": null}'),
            event(3, "2024-12-31 23:59:59.999999", "purchase", 1e6,
                  '{"other": 7}'),
            event(4, "2024-06-01 12:00:00", "view", 2.5,
                  '{"k": 41, "extra": "x"}'),
            event(5, "2024-06-02 12:00:00", "click", None, None),  # NULLs
            event(6, "2024-06-03 12:00:00", "view", 3.25, ""),     # empty props
            event(7, None, "view", 1.0, "{}"),                     # NULL ts
            event(8, "2024-06-04 12:00:00", None, 1.0, "{}"),      # NULL type
            event(9, "2024-06-05 12:00:00", "view", 1.0, "{}", user=0),  # NULL user
        ]
        # NULL event_type as a real daily SERIES (10 distinct valued
        # days with a 2-day calendar gap): the q143/q252/q257/q288
        # NULL-stratum recursions must REPLAY (an equality join drops
        # the NULL group past rn=1), and q288's calendar day-7 naive
        # must stay on phase across the gap (row-lag-7 would slip)
        + [
            event(9 + i, f"2024-07-{d:02d} 09:00:00", None,
                  float(7 * i + 1) / 4.0, "{}")
            for i, d in enumerate([1, 2, 3, 4, 5, 8, 9, 10, 11, 12], 1)
        ]
        # r10: PRE-EPOCH timestamp (negative epoch micros/days) -- the
        # div/%-on-negative-dividend parity lane exercised where it
        # actually bites: week = epoch_day div 7, dow anchors, daily
        # series where 1969 becomes rn=1, gap/second arithmetic
        + [event(20, "1969-12-30 23:59:59", "view", 1.25, "{}")],
    )


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--extreme"]
    extreme = "--extreme" in sys.argv[1:]
    src = argv[0] if argv else "/root/testdata/sf0.001"
    only = argv[1:]
    if only:
        # the checker silently skips unknown names -- that would turn a
        # typo into a false green, so validate against the registry first
        sys.path.insert(0, os.path.dirname(HERE))
        import __spark_entry__ as entrymod

        unknown = sorted(set(only) - set(entrymod.queries()))
        if unknown:
            print(f"unknown query names: {unknown}")
            return 2
    out = tempfile.mkdtemp(prefix="fuzz-sf-")
    build_adversarial(src, out, extreme=extreme)
    print(
        f"adversarial corpus at {out} (from {src})"
        + (" [--extreme: top-of-lane order values]" if extreme else "")
    )
    try:
        return subprocess.call(
            [sys.executable, os.path.join(HERE, "check_correctness.py"), out, *only]
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
