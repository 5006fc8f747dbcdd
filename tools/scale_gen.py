#!/usr/bin/env python3
"""Scale-rehearsal data generator (driver-side tooling, not library code).

Fits the synthetic-corpus distributions of /root/testdata/sf0.1
(documents: unigram word model + empirical token-length distribution;
embeddings: per-dim uniform ranges with fixed-size label blocks; events:
empirical categorical/value distributions) and regenerates them at a
requested multiplier with a fixed seed. Near-dup density in the source
corpus is CHANCE-driven (independent draws from a ~30-word vocabulary),
so drawing more rows from the same fitted model preserves per-doc
candidate density — the property that makes t(x10)/t(x1) a meaningful
scaling measurement. Label blocks stay ~200 rows and SCALE IN NUMBER
(10 blocks at x1 -> 100 at x10), matching how a real corpus grows: more
blocks, not denser ones.

Usage: python3 tools/scale_gen.py <outdir> <multiplier>
"""
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(outdir: str, mult: float) -> None:
    con = duckdb.connect()
    rnd = random.Random(20260812)
    n_docs = int(5000 * mult)
    n_emb = int(2000 * mult)
    n_events = int(100000 * mult)

    # ---- documents: unigram model + length distribution ----------------
    vocab_rows = con.execute(f"""
        SELECT tok, count(*) AS c FROM (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
          FROM '{SRC}/documents.parquet') GROUP BY 1 ORDER BY 1""").fetchall()
    vocab = [t for t, _ in vocab_rows]
    weights = [c for _, c in vocab_rows]
    lengths = [r[0] for r in con.execute(f"""
        SELECT len(string_split_regex(lower(trim(text)), '\\s+'))
        FROM '{SRC}/documents.parquet'""").fetchall()]
    langs_src = con.execute(f"""
        SELECT lang, source, count(*) FROM '{SRC}/documents.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    ls_vals = [(l, s) for l, s, _ in langs_src]
    ls_w = [c for _, _, c in langs_src]
    docs = []
    for i in range(n_docs):
        k = rnd.choice(lengths)
        text = " ".join(rnd.choices(vocab, weights=weights, k=k))
        lang, source = rnd.choices(ls_vals, weights=ls_w, k=1)[0]
        docs.append((i, text, lang, source, len(text)))
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", docs)
    con.execute(f"COPY d TO '{outdir}/documents.parquet' (FORMAT PARQUET)")

    # ---- embeddings: uniform per-dim, fixed-size label blocks ----------
    dim_ranges = con.execute(f"""
        SELECT i, min(embedding[i]), max(embedding[i])
        FROM '{SRC}/embeddings.parquet', range(1, 65) r(i) GROUP BY 1 ORDER BY 1""").fetchall()
    n_labels = max(1, round(n_emb / 200))
    emb = []
    for i in range(n_emb):
        v = [rnd.uniform(lo, hi) for _, lo, hi in dim_ranges]
        emb.append((i, v, i % n_labels))
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", emb)
    con.execute(f"COPY e TO '{outdir}/embeddings.parquet' (FORMAT PARQUET)")

    # ---- events: resample fields from empirical distributions ----------
    lo_ts, hi_ts = con.execute(
        f"SELECT min(ts), max(ts) FROM '{SRC}/events.parquet'").fetchone()
    types = con.execute(f"""
        SELECT event_type, count(*) FROM '{SRC}/events.parquet'
        GROUP BY 1 ORDER BY 1""").fetchall()
    tvals = [t for t, _ in types]
    tw = [c for _, c in types]
    max_user = con.execute(
        f"SELECT max(user_id) FROM '{SRC}/events.parquet'").fetchone()[0]
    span = (hi_ts - lo_ts).total_seconds()
    ev = []
    for i in range(n_events):
        ts = lo_ts + __import__("datetime").timedelta(seconds=rnd.uniform(0, span))
        ev.append((i, ts, rnd.randrange(int(max_user * mult) + 1),
                   rnd.choices(tvals, weights=tw, k=1)[0],
                   round(rnd.uniform(0, 500), 2), "{}"))
    con.execute("CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?, ?, ?)", ev)
    con.execute(f"COPY ev TO '{outdir}/events.parquet' (FORMAT PARQUET)")
    print(f"wrote {n_docs} docs, {n_emb} embeddings ({n_labels} labels), "
          f"{n_events} events to {outdir}")


if __name__ == "__main__":
    import os
    out, mult = sys.argv[1], float(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    main(out, mult)
