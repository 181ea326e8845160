#!/usr/bin/env python3
"""Synthesize a scale-factor dataset matching /root/testdata's schema and
distributions — the r16 scale-ladder probe needs sf1 (10x the bench's
sf0.1) and the driver only ships sf<=0.1. Developer-side tool only (the
shipped Scala library has no Python deps); distributions were measured
off sf0.1 (vocab, words/doc 10-100 uniform, lang/source mixes, unit-norm
64-dim gaussian embeddings, 30-day event window, users = events/66.7,
~0.16% exact-dup docs).

Usage: python3 tools/gen_sf.py <scale_vs_sf0.1> <outdir>
       python3 tools/gen_sf.py 10 /tmp/graft_sf1
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    'a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
    'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
    'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
    'spark', 'stream', 'table', 'the', 'value', 'vector', 'window'])
LANGS = (['en'] * 41 + ['zh'] * 15 + ['es'] * 15 + ['fr'] * 15
         + ['de'] * 14)
SEGMENTS = ['MACHINERY', 'AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD']
ETYPES = ['signup', 'click', 'error', 'view', 'purchase']


def write(outdir, name, table):
    pq.write_table(table, f"{outdir}/{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def main(scale, outdir):
    rng = np.random.default_rng(1)
    import os
    os.makedirs(outdir, exist_ok=True)

    # region / nation: fixed dims
    write(outdir, 'region', pa.table({
        'r_regionkey': pa.array(range(5), pa.int64()),
        'r_name': ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']}))
    write(outdir, 'nation', pa.table({
        'n_nationkey': pa.array(range(25), pa.int64()),
        'n_name': [f'NATION_{i}' for i in range(25)],
        'n_regionkey': pa.array([i % 5 for i in range(25)], pa.int32())}))

    n_doc = int(5000 * scale)
    counts = rng.integers(10, 101, n_doc)
    texts = [' '.join(rng.choice(VOCAB, c)) for c in counts]
    # ~0.16% exact dups, like sf0.1's 4992/5000 distinct
    for i in rng.choice(n_doc, max(1, int(n_doc * 0.0016)), replace=False):
        if i > 0:
            texts[i] = texts[i - 1]
    write(outdir, 'documents', pa.table({
        'doc_id': pa.array(range(n_doc), pa.int64()),
        'text': texts,
        'lang': rng.choice(LANGS, n_doc),
        'source': [f'src{i % 20}' for i in range(n_doc)],
        'n_chars': pa.array([len(t) for t in texts], pa.int64())}))

    n_emb = int(2000 * scale)
    vec = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    write(outdir, 'embeddings', pa.table({
        'vec_id': pa.array(range(n_emb), pa.int64()),
        'embedding': pa.array(list(vec), pa.list_(pa.float32())),
        'label': pa.array(rng.integers(0, 10, n_emb), pa.int32())}))

    n_ev = int(100000 * scale)
    n_users = int(1500 * scale)
    t0 = np.datetime64('2024-01-01T00:00:00')
    span = np.timedelta64(30 * 24 * 3600 - 60, 's') / np.timedelta64(1, 's')
    ts = t0 + (rng.random(n_ev) * span * 1e6).astype('timedelta64[us]')
    write(outdir, 'events', pa.table({
        'event_id': pa.array(range(n_ev), pa.int64()),
        'ts': pa.array(ts),
        'user_id': pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        'event_type': rng.choice(ETYPES, n_ev),
        'value': np.round(rng.random(n_ev) * 560, 2),
        'props': [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

    n_cust = int(15000 * scale)
    write(outdir, 'customer', pa.table({
        'c_custkey': pa.array(range(n_cust), pa.int64()),
        'c_name': [f'Customer#{i:09d}' for i in range(n_cust)],
        'c_nationkey': pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        'c_acctbal': np.round(rng.random(n_cust) * 11000 - 1000, 2),
        'c_mktsegment': rng.choice(SEGMENTS, n_cust)}))

    n_supp = int(1000 * scale)
    write(outdir, 'supplier', pa.table({
        's_suppkey': pa.array(range(n_supp), pa.int64()),
        's_name': [f'Supplier#{i:09d}' for i in range(n_supp)],
        's_nationkey': pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        's_acctbal': np.round(rng.random(n_supp) * 10000, 2)}))

    n_part = int(20000 * scale)
    adjs = ['large', 'hot', 'small', 'cold', 'dim', 'fast', 'slow', 'new']
    nouns = ['ring', 'bolt', 'washer', 'gear', 'cog', 'pin', 'rod', 'cap']
    write(outdir, 'part', pa.table({
        'p_partkey': pa.array(range(n_part), pa.int64()),
        'p_name': [f'{adjs[i % 8]} {nouns[(i // 8) % 8]}'
                   for i in range(n_part)],
        'p_brand': [f'Brand#{i % 25}' for i in range(n_part)],
        'p_container': rng.choice(
            ['LARGE', 'ECONOMY', 'SMALL', 'JUMBO', 'STANDARD'], n_part),
        'p_size': pa.array(rng.integers(1, 51, n_part), pa.int32()),
        'p_retailprice': np.round(900 + rng.random(n_part) * 1200, 2)}))

    n_ord = int(150000 * scale)
    od0 = np.datetime64('1995-01-01')
    write(outdir, 'orders', pa.table({
        'o_orderkey': pa.array(range(n_ord), pa.int64()),
        'o_custkey': pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        'o_orderstatus': rng.choice(['O', 'F', 'P'], n_ord),
        'o_totalprice': np.round(rng.random(n_ord) * 400000, 2),
        'o_orderdate': pa.array(
            od0 + rng.integers(0, 2500, n_ord).astype('timedelta64[D]')),
        'o_orderpriority': rng.choice(
            ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'],
            n_ord)}))

    n_li = int(600000 * scale)
    sd0 = np.datetime64('1995-01-01')
    write(outdir, 'lineitem', pa.table({
        'l_orderkey': pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        'l_partkey': pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        'l_suppkey': pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        'l_linenumber': pa.array(rng.integers(1, 8, n_li), pa.int32()),
        'l_quantity': rng.integers(1, 51, n_li).astype(np.float64),
        'l_extendedprice': np.round(rng.random(n_li) * 100000, 2),
        'l_discount': np.round(rng.integers(0, 11, n_li) / 100, 2),
        'l_tax': np.round(rng.integers(0, 9, n_li) / 100, 2),
        'l_returnflag': rng.choice(['N', 'A', 'R'], n_li),
        'l_linestatus': rng.choice(['O', 'F'], n_li),
        'l_shipdate': pa.array(
            sd0 + rng.integers(0, 2600, n_li).astype('timedelta64[D]'))}))


if __name__ == '__main__':
    main(float(sys.argv[1]), sys.argv[2])
