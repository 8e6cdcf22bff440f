"""Deterministic synthetic transcripts generator.

Produces the authoritative input shape from BASELINE.json `input_hint`:
(conv_id:string, turn_idx:int32, role:string, text:large_string,
tool:string, ts:timestamp[us]). Conversation sizes are Zipf-skewed so a
few conv_ids are hotspots (exercises salted aggregation and routing
balance), and the `text` column mixes payload families so the parse
stage has real work (FIXTURES.md F1): NCSA-extended access-log lines,
nginx-JSON lines, W3C-extended lines, free prose, and truncated/
malformed lines; a slice of log lines carries bot user-agents.

Everything is seeded (default 42) and pure numpy/pandas — same inputs
=> byte-identical parquet, which is what lets the DuckDB oracle and the
Ray pipeline read the same table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import schemas

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_W = np.array([0.3, 0.3, 0.1, 0.3])

TOOLS = np.array(["search", "browser", "bash", "python", ""])
TOOL_W = np.array([0.2, 0.15, 0.2, 0.15, 0.3])

FAMILIES = np.array(
    [
        "ncsa", "nginx_json", "w3c", "common", "common_vhost",
        "icecast2", "cloudfront", "elb", "s3", "iis", "common_complete",
        "shoutcast", "prose", "malformed",
    ]
)
FAMILY_W = np.array(
    [0.18, 0.13, 0.09, 0.07, 0.08, 0.04, 0.05, 0.05, 0.05, 0.04, 0.04, 0.03, 0.08, 0.07]
)

VHOSTS = np.array(["scielo.br", "data.scielo.org", "preprints.scielo.org"])

METHODS = np.array(["GET", "GET", "GET", "POST", "HEAD"])
PATHS = np.array(
    [
        "/index.html",
        "/article/view/123",
        "/journal/abc/issue/4",
        "/search?q=metrics",
        "/static/app.css",
        "/static/app.js",
        "/img/logo.png",
        "/favicon.ico",
        "/admin/login",
        "/internal/health",
        "/api/v1/export",
        "/pdf/read/889",
    ]
)
STATUSES = np.array([200, 200, 200, 200, 206, 301, 302, 304, 404, 403, 500, 503])
REFERRERS = np.array(["-", "https://scholar.example/org", "https://news.example/x", "-"])
USER_AGENTS = np.array(
    [
        "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/121.0",
        "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/120.0",
        "Mozilla/5.0 (Macintosh) Safari/605.1.15",
        "Googlebot/2.1 (+http://www.google.com/bot.html)",
        "bingbot/2.0 (+http://www.bing.com/bingbot.htm)",
        "python-requests/2.31 crawler",
        "curl/8.4.0",
    ]
)
PROSE_WORDS = np.array(
    (
        "the model ran a query over the table and returned rows sorted by key "
        "please summarize the access pattern for this conversation and list "
        "errors found while parsing recent log files from the ingest queue"
    ).split()
)


def generate_transcripts(n_turns: int, seed: int = 42, conv_start: int = 0) -> pa.Table:
    """``conv_start`` offsets conversation numbering so independently
    generated shards have disjoint conv_id ranges."""
    rng = np.random.default_rng(seed)

    # Zipf-skewed conversation sizes, clipped to [1, 64] (FIXTURES.md F1).
    sizes = []
    total = 0
    while total < n_turns:
        draw = np.clip(rng.zipf(1.3, size=4096), 1, 64)
        sizes.append(draw)
        total += int(draw.sum())
    sizes = np.concatenate(sizes)
    cum = np.cumsum(sizes)
    n_convs = int(np.searchsorted(cum, n_turns) + 1)
    sizes = sizes[:n_convs]
    sizes[-1] -= int(cum[n_convs - 1] - n_turns) if cum[n_convs - 1] > n_turns else 0

    conv_nums = np.repeat(np.arange(n_convs) + conv_start, sizes)
    # vectorized conv-%08d (zfill via C string kernels, no Python loop)
    conv_id = (
        "conv-" + pd.Series(conv_nums.astype(str)).str.zfill(8)
    ).to_numpy(dtype=object)
    turn_idx = (np.arange(n_turns) - np.repeat(np.cumsum(sizes) - sizes, sizes)).astype(
        np.int32
    )

    role = rng.choice(ROLES, size=n_turns, p=ROLE_W)
    tool = rng.choice(TOOLS, size=n_turns, p=TOOL_W)
    # role 'tool' always names a tool; non-tool roles may have ''.
    tool = np.where((role == "tool") & (tool == ""), "bash", tool)

    base = np.datetime64("2024-01-01T00:00:00", "us")
    conv_offset = (conv_nums.astype(np.int64) * 97_000_000) % (86_400_000_000 * 365)
    ts = base + conv_offset + turn_idx.astype(np.int64) * 7_000_000

    fam = rng.choice(FAMILIES, size=n_turns, p=FAMILY_W)
    ip = (
        "10."
        + rng.integers(1, 255, size=n_turns).astype(str).astype(object)
        + "."
        + rng.integers(0, 255, size=n_turns).astype(str).astype(object)
        + "."
        + rng.integers(1, 255, size=n_turns).astype(str).astype(object)
    )
    method = rng.choice(METHODS, size=n_turns)
    path = rng.choice(PATHS, size=n_turns)
    status = rng.choice(STATUSES, size=n_turns)
    nbytes = rng.integers(64, 1 << 20, size=n_turns)
    referrer = rng.choice(REFERRERS, size=n_turns)
    ua = rng.choice(USER_AGENTS, size=n_turns, p=[0.25, 0.25, 0.2, 0.1, 0.08, 0.07, 0.05])

    tss = pd.Series(ts)
    t_ncsa = tss.dt.strftime("%d/%b/%Y:%H:%M:%S +0000").to_numpy(object)
    t_iso = tss.dt.strftime("%Y-%m-%dT%H:%M:%SZ").to_numpy(object)
    t_w3c_d = tss.dt.strftime("%Y-%m-%d").to_numpy(object)
    t_w3c_t = tss.dt.strftime("%H:%M:%S").to_numpy(object)

    s = status.astype(str).astype(object)
    b = nbytes.astype(str).astype(object)
    ncsa = (
        ip + " - - [" + t_ncsa + '] "' + method.astype(object) + " "
        + path.astype(object) + ' HTTP/1.1" ' + s + " " + b + ' "'
        + referrer.astype(object) + '" "' + ua.astype(object) + '"'
    )
    nginx = (
        '{"remote_addr":"' + ip + '","time":"' + t_iso + '","method":"'
        + method.astype(object) + '","path":"' + path.astype(object)
        + '","status":' + s + ',"bytes":' + b + ',"referer":"'
        + referrer.astype(object) + '","ua":"' + ua.astype(object) + '"}'
    )
    ua_plus = pd.Series(ua).str.replace(" ", "+", regex=False).to_numpy(object)
    w3c = (
        t_w3c_d + " " + t_w3c_t + " " + ip + " " + method.astype(object) + " "
        + path.astype(object) + " " + s + " " + b + " " + ua_plus
    )
    common = (
        ip + " - - [" + t_ncsa + '] "' + method.astype(object) + " "
        + path.astype(object) + ' HTTP/1.1" ' + s + " " + b
    )
    vhost = rng.choice(VHOSTS, size=n_turns).astype(object)
    common_vhost = vhost + " " + common
    common_complete = vhost + " " + ncsa

    ref = referrer.astype(object)
    mth = method.astype(object)
    pth = path.astype(object)
    shoutcast = (
        ip + " client.example " + t_w3c_d + " " + t_w3c_t + " " + pth + " "
        + s + " " + ua_plus + " " + b + " "
        + rng.integers(1, 7200, size=n_turns).astype(str).astype(object) + " 128"
    )
    duration = rng.integers(0, 7200, size=n_turns).astype(str).astype(object)
    icecast2 = ncsa + " " + duration
    edge = rng.choice(np.array(["IAD79-C1", "GRU1-C2", "MAD50-P1"]), size=n_turns).astype(object)
    cloudfront = (
        t_w3c_d + "\t" + t_w3c_t + "\t" + edge + "\t" + b + "\t" + ip + "\t"
        + mth + "\t" + vhost + "\t" + pth + "\t" + s + "\t" + ref + "\t" + ua_plus
    )
    # %.6f (never scientific notation — 'e' would fall outside the
    # latency charclass [\d.+-] and silently invalidate the line)
    lat = np.char.mod("%.6f", rng.random(size=(n_turns, 3))).astype(object)
    elb = (
        t_iso + " prod-elb " + ip + ":443 10.0.0.9:80 "
        + lat[:, 0] + " " + lat[:, 1] + " "
        + lat[:, 2] + " " + s + " 200 0 " + b + ' "'
        + mth + " " + pth + ' HTTP/1.1" "' + ua.astype(object)
        + '" ECDHE-RSA-AES128 TLSv1.2'
    )
    s3_line = (
        "79a5" + " " + vhost + " [" + t_ncsa + "] " + ip
        + " - 3E57427F3 REST.GET.OBJECT key1 \"" + mth + " " + pth
        + ' HTTP/1.1" ' + s + " - " + b + " " + b + " 12 11 \"" + ref
        + '" "' + ua.astype(object) + '" -'
    )
    iis = (
        t_w3c_d + " " + t_w3c_t + " 10.0.0.1 " + mth + " " + pth
        + " - 443 - " + ip + " " + ua_plus + " " + s + " 0 0 "
        + rng.integers(1, 5000, size=n_turns).astype(str).astype(object)
    )

    prose_idx = rng.integers(0, len(PROSE_WORDS), size=(n_turns, 8))
    prose = PROSE_WORDS.astype(object)[prose_idx[:, 0]]
    for k in range(1, 8):
        prose = prose + " " + PROSE_WORDS.astype(object)[prose_idx[:, k]]
    malformed = pd.Series(ncsa).str.slice(0, 25).to_numpy(object)

    text = np.select(
        [
            fam == "ncsa",
            fam == "nginx_json",
            fam == "w3c",
            fam == "common",
            fam == "common_vhost",
            fam == "icecast2",
            fam == "cloudfront",
            fam == "elb",
            fam == "s3",
            fam == "iis",
            fam == "common_complete",
            fam == "shoutcast",
            fam == "prose",
        ],
        [ncsa, nginx, w3c, common, common_vhost, icecast2, cloudfront, elb, s3_line, iis, common_complete, shoutcast, prose],
        default=malformed,
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.large_string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=schemas.TRANSCRIPTS,
    )


# sf -> number of turns (mirrors the driver's lineitem scaling: sf0.01 ~ 60k).
SF_TURNS = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}
CACHE_DIR = "/tmp/mla_ray"


def transcripts_path(sf: str = "sf0.01", seed: int = 42) -> str:
    """Generate (once) and return the cached parquet path for a scale.

    Written with multiple row groups so Ray Data and pyarrow can split
    the file into several blocks/partitions.
    """
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"transcripts_v5_{sf}_seed{seed}.parquet")
    if not os.path.exists(path):
        n = SF_TURNS.get(sf, 60_000)
        tbl = generate_transcripts(n, seed=seed)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=max(2048, n // 32))
        os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# Log-path registry fixture (FIXTURES.md F2): deterministic corpus of file
# paths exercising the routing/date/validity extractors, for driver queries.
# ---------------------------------------------------------------------------
_PATH_TEMPLATES = [
    "/usage/scl/node03/{d}.log.gz",
    "/usage/scl/hiperion/apache/{d}.log.gz",
    "/usage/scl/hiperion/varnish/{d}.log.gz",
    "/usage/scl/varnishncsa/node03/{d}.log.gz",
    "/usage/nbr/scielo.nbr.2.{d}.log.gz",
    "/usage/nbr/newbrvarnish02/x-{d}.log.gz",
    "/usage/dat/dataverse/data.scielo.{d}.log.gz",
    "/usage/dat/dataverse/plain-{d}.log.gz",
    "/usage/pre/preprints/preprints.{d}.log.gz",
    "/usage/pre/preprints/error/preprints.{d}.log.gz",
    "/usage/ven/apache/centos-2gb-nyc3-01/{d}.ve-scielo-org.log.gz",
    "/usage/ven/logs-ha/x-{d}.log.gz",
    "/usage/arg/scielo.ar.{d}.log.gz",
    "/usage/esp/01_scielo.es.{d}.log.gz",
    "/usage/scielo.cu/access-{d}.log.gz",
    "/usage/misc/unknown-{d}.log.gz",
    "/usage/misc/nodate.log.gz",
    "/usage/misc/bad-2020-13-45.log.gz",
    "/usage/misc/compact.{c}.log.gz",
]


def generate_log_paths(seed: int = 42) -> pa.Table:
    """Cross the path templates with dates spanning every rule boundary
    (2020-04-29, 2021-05-25, 2022-04-05, 2022-05-08) plus compact-format
    dates; one (collection, path) row per combination."""
    days = pd.concat(
        [
            pd.Series(pd.date_range("2020-04-25", periods=8, freq="D")),
            pd.Series(pd.date_range("2021-05-22", periods=6, freq="D")),
            pd.Series(pd.date_range("2022-04-03", periods=6, freq="D")),
            pd.Series(pd.date_range("2022-05-06", periods=6, freq="D")),
        ]
    )
    rows = []
    for tmpl in _PATH_TEMPLATES:
        coll = tmpl.split("/")[2]
        coll = coll if len(coll) == 3 else ("cub" if "scielo.cu" in tmpl else "xxx")
        for day in days:
            p = tmpl.format(d=day.strftime("%Y-%m-%d"), c=day.strftime("%Y%m%d"))
            rows.append((coll, p))
    df = pd.DataFrame(rows, columns=["collection", "path"]).drop_duplicates(
        subset=["collection", "path"]
    ).reset_index(drop=True)
    # deterministic file-stat metadata (size bytes, st_ctime epoch
    # seconds) — what a real directory scan would carry (S2)
    import zlib

    crc = df["path"].map(lambda p: zlib.crc32(p.encode())).astype("int64")
    df["size"] = 1_000 + (crc % 50_000_000)
    df["created_at"] = 1_577_836_800 + (crc % 94_608_000)  # 2020 + <3y
    return pa.Table.from_pandas(df, preserve_index=False)


def log_paths_path(seed: int = 42) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"log_paths_v2_seed{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(generate_log_paths(seed), tmp, row_group_size=512)
        os.replace(tmp, path)
    return path


def transcripts_shards_dir(
    n_turns: int, seed: int = 42, n_shards: int = 32
) -> str:
    """Sharded transcripts directory (one parquet file per shard) — the
    realistic many-file layout. A single big file is read by ONE Ray
    read task (measured: a 1.4 GB file serialized the whole pipeline
    behind a 12 s serial read); sharding gives read parallelism =
    n_shards."""
    import ray

    os.makedirs(CACHE_DIR, exist_ok=True)
    d = os.path.join(CACHE_DIR, f"transcripts_v5_{n_turns}x{n_shards}_seed{seed}")
    if not os.path.isdir(d):
        tmpd = d + ".tmp"
        os.makedirs(tmpd, exist_ok=True)
        per = (n_turns + n_shards - 1) // n_shards

        def write_shard(i: int) -> None:
            part = generate_transcripts(
                min(per, n_turns - i * per),
                seed=seed * 100_003 + i,
                conv_start=i * 100_000_000,
            )
            pq.write_table(
                part,
                os.path.join(tmpd, f"part-{i:05d}.parquet"),
                row_group_size=max(16384, per // 4),
            )

        idx = [i for i in range(n_shards) if min(per, n_turns - i * per) > 0]
        if ray.is_initialized():
            # Bounded in-flight window: each shard builder holds the
            # whole shard in heap (a 1M-turn shard peaks ~2-3 GB), so
            # session-wide fan-out (32+ concurrent at 64M turns) OOMs
            # the box. 8 concurrent builders saturate generation
            # (string formatting is the bottleneck) within ~24 GB.
            shard_task = ray.remote(num_cpus=1)(write_shard)
            max_inflight = 8
            pending: list = []
            for i in idx:
                if len(pending) >= max_inflight:
                    done, pending = ray.wait(pending, num_returns=1)
                    # surface shard-builder failures NOW — otherwise a
                    # failed task's exception is dropped and os.replace
                    # publishes (and caches) a corpus with missing shards
                    ray.get(done)
                pending.append(shard_task.remote(i))
            ray.get(pending)
        else:
            for i in idx:
                write_shard(i)
        os.replace(tmpd, d)
    return d


def media_path(n: int = 512, seed: int = 42) -> str:
    """Deterministic fake-media parquet (ops/multimodal fixture)."""
    from .ops import multimodal

    os.makedirs(CACHE_DIR, exist_ok=True)
    # v3: image/bmp + audio/wav rows carry REAL payloads (built-in
    # pure-python codecs in ops/multimodal) matching the metadata
    path = os.path.join(CACHE_DIR, f"media_v3_{n}_seed{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(multimodal.generate_fake_media(n, seed=seed), tmp, row_group_size=128)
        os.replace(tmp, path)
    return path


def generate_documents(n: int, seed: int = 42, dup_rate: float = 0.05) -> pa.Table:
    """Deterministic document corpus for the training-data op benches:
    20-60-word prose docs with a ``dup_rate`` slice of exact duplicates
    and a near-dup slice (one word changed)."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(20, 60, size=n)
    total = int(lens.sum())
    # 10k-word Zipf vocabulary: a realistic fingerprint/shingle space.
    # (A tiny vocab makes every simhash chunk collide -> quadratic pair
    # explosion that no bucketing can bound.)
    vocab = np.array([f"w{i:04d}" for i in range(10_000)], dtype=object)
    zipf = 1.0 / np.arange(1, len(vocab) + 1)
    zipf /= zipf.sum()
    words = vocab[rng.choice(len(vocab), size=total, p=zipf)]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = np.array(
        [" ".join(words[offs[i] : offs[i + 1]]) for i in range(n)], dtype=object
    )
    n_dup = int(n * dup_rate)
    if n_dup:
        src = rng.integers(0, n - n_dup, size=n_dup)
        texts[n - n_dup :] = texts[src]  # exact dups
        near = rng.integers(0, n - n_dup, size=n_dup // 2)
        for j, s in enumerate(near):  # near dups: one word swapped
            toks = texts[s].split()
            toks[len(toks) // 2] = "swapped"
            texts[(n - n_dup) // 2 + j] = " ".join(toks)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )


def documents_path(n: int = 100_000, seed: int = 42) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"documents_v2_{n}_seed{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(generate_documents(n, seed=seed), tmp, row_group_size=max(4096, n // 16))
        os.replace(tmp, path)
    return path


def generate_summaries(n: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic import-summary documents (M12 fixture): every doc
    carries all eight counter labels plus 'total time', interleaved with
    noise lines; a slice duplicates counter lines LATER in the document
    (last occurrence wins). Counter lines always carry a number and at
    most one label, so the reversed-scan semantics and the oracle's
    greedy-last regex provably agree.

    A5 scenarios (i % 5) exercise every branch of the status /
    lines_parsed resolution (reference libs/lib_summary.py:56-91):
      0: expected == imported+ignored -> LOADED via the direct total;
      1: expected == total + 1 -> LOADED via the +-1 tolerance window;
      2: expected off, 'lines parsed' line (exactly 4 integers) whose
         first integer == expected -> LOADED with lines_parsed from it;
      3: parsed = expected + RETRY_DIFF + 1000 -> PARTIAL with the
         RETRY_DIFF_LINES safety subtraction;
      4: parsed tiny (i%10==4) -> FAILED / 0; malformed 3-integer
         'lines parsed' line (i%10==9) -> FAILED / 0.
    The 'lines parsed' line carries no counter label and appears once,
    so counter extraction and the A5 oracle regex stay independent."""
    rng = np.random.default_rng(seed)
    from .control import summary as summod

    docs = []
    for i in range(n):
        vals = {a: int(rng.integers(0, 100000)) for a in summod.COUNTER_ATTRS}
        lines = [f"Logs import summary #{i}", "-------------------------"]
        for a in summod.COUNTER_ATTRS:
            lines.append(f"    {vals[a]} {a.replace('_', ' ')}")
            if rng.random() < 0.3:
                lines.append("Purging Matomo archives for dates: 2024-01-12")
        lines.append(f"Total time: {int(rng.integers(1, 900))} seconds")
        if i % 4 == 0:
            # Duplicate BELOW the full set. Only the alphabetically
            # FIRST attr is safe to duplicate: the reversed scan stops
            # (all 8 seen) before re-reading its earlier line, so the
            # later value wins — for any other attr the scan would
            # re-reach the earlier line first and overwrite (the
            # reference's exact overwrite-until-filled behavior,
            # lib_summary.py:94-111), which a greedy-last oracle regex
            # cannot model.
            a = summod.COUNTER_ATTRS[0]
            vals[a] = int(rng.integers(0, 100000))
            lines.append(f"    {vals[a]} {a.replace('_', ' ')}")

        total = vals["requests_imported_successfully"] + vals["requests_ignored"]
        scen = i % 5
        if scen == 0:
            expected = total
        elif scen == 1:
            expected = total + 1
        elif scen == 2:
            expected = total + 777
            lines.append(
                f"    {expected} lines parsed, "
                f"{int(rng.integers(1, 999))} lines recorded, "
                f"{int(rng.integers(1, 999))} ok, "
                f"{int(rng.integers(1, 999))} dropped"
            )
        elif scen == 3:
            expected = total + 777
            parsed = expected + summod.RETRY_DIFF_LINES + 1000
            lines.append(
                f"    {parsed} lines parsed, "
                f"{int(rng.integers(1, 999))} lines recorded, "
                f"{int(rng.integers(1, 999))} ok, "
                f"{int(rng.integers(1, 999))} dropped"
            )
        else:
            expected = total + 777
            if i % 10 == 4:
                lines.append(
                    f"    {int(rng.integers(1, 99))} lines parsed, "
                    f"{int(rng.integers(1, 999))} lines recorded, "
                    f"{int(rng.integers(1, 999))} ok, "
                    f"{int(rng.integers(1, 999))} dropped"
                )
            else:
                lines.append(
                    f"    {int(rng.integers(1, 99999))} lines parsed, "
                    f"{int(rng.integers(1, 999))} lines recorded, "
                    f"{int(rng.integers(1, 999))} ok"
                )
        docs.append(
            {
                "summary_id": f"s-{i:04d}",
                "text": "\n".join(lines),
                "expected_lines": expected,
            }
        )
    return pa.Table.from_pylist(docs)


def summaries_path(seed: int = 42) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"summaries_v2_seed{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(generate_summaries(seed=seed), tmp, row_group_size=64)
        os.replace(tmp, path)
    return path


def summary_files_dir(seed: int = 42) -> str:
    """S3 source fixture (reference libs/lib_summary.py:114-119 reads
    whole summary FILES, not rows): the generate_summaries corpus
    written out as one real text file per document —
    ``<dir>/files/<summary_id>`` — plus ``<dir>/expected.parquet``
    (summary_id, expected_lines), the per-file expected-line counts the
    reader's status resolution consumes. The engine gate reads the
    files through control.summary.read_and_parse_summaries
    (ray.data.read_binary_files); the DuckDB oracle reads the SAME
    bytes via read_text over the files glob."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    d = os.path.join(CACHE_DIR, f"summary_files_v1_seed{seed}")
    if not os.path.isdir(d):
        import shutil

        tmpd = d + ".tmp"
        if os.path.isdir(tmpd):
            shutil.rmtree(tmpd)
        files = os.path.join(tmpd, "files")
        os.makedirs(files)
        t = generate_summaries(seed=seed)
        for sid, text in zip(
            t["summary_id"].to_pylist(), t["text"].to_pylist()
        ):
            with open(os.path.join(files, sid), "w") as f:
                f.write(text)
        pq.write_table(
            t.select(["summary_id", "expected_lines"]),
            os.path.join(tmpd, "expected.parquet"),
        )
        os.replace(tmpd, d)
    return d


def rawlog_paths(n: int = 20_000, seed: int = 7) -> tuple[str, str]:
    """Deterministic raw log file (.log) plus its gzip twin (.log.gz):
    the transcripts line generator's text column, one line per row —
    the S6 source fixture (reference .gz handling evidence:
    /root/reference/libs/lib_file_name.py:175-176 gunzip name builder,
    /root/reference/libs/lib_status.py:110 .log.gz validity check).
    The engine reads the COMPRESSED twin via ray.data.read_text; the
    DuckDB oracle reads the plain twin — identical content."""
    import gzip

    os.makedirs(CACHE_DIR, exist_ok=True)
    base = os.path.join(CACHE_DIR, f"rawlog_v1_seed{seed}")
    log, gz = base + ".log", base + ".log.gz"
    if not (os.path.exists(log) and os.path.exists(gz)):
        t = generate_transcripts(n, seed=seed)
        data = "\n".join(t["text"].to_pylist()) + "\n"
        tmp = log + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, log)
        tmp = gz + ".tmp"
        with gzip.open(tmp, "wt") as f:
            f.write(data)
        os.replace(tmp, gz)
    return log, gz


def simhash_path(sf_dir: str) -> str:
    """Cached simhash fingerprints of {sf_dir}/documents.parquet — the
    ORACLE INPUT for the Hamming-verify gate. Computed once with the
    engine's own (pytest-gated) simhash kernel; the driver gate then
    checks the chunk-bucketing + distributed-verify pipeline end-to-end
    against DuckDB's all-pairs xor/bit_count over these fingerprints."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    key = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(CACHE_DIR, f"simhash_v1_{key}.parquet")
    if not os.path.exists(path):
        from .ops import dedup

        df = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pandas()
        fp = dedup.simhash_batch(df)
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(fp, preserve_index=False), tmp)
        os.replace(tmp, path)
    return path


def sf_from_dir(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our sf key."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SF_TURNS else "sf0.01"

def jsonl_events_paths(sf_dir: str) -> tuple[str, str]:
    """Deterministic JSONL twin of {sf_dir}/events.parquet (plus a gzip
    copy): the JSON-lines ingest fixture. One JSON object per line with
    ts as epoch microseconds (lossless round-trip). The engine reads
    the COMPRESSED twin via ray.data.read_json; the DuckDB oracle reads
    the plain twin — identical content."""
    import gzip
    import json as _json

    os.makedirs(CACHE_DIR, exist_ok=True)
    key = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(CACHE_DIR, f"events_jsonl_v1_{key}")
    plain, gz = base + ".jsonl", base + ".jsonl.gz"
    if not (os.path.exists(plain) and os.path.exists(gz)):
        df = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
        lines = [
            _json.dumps(
                {
                    "event_id": int(r.event_id),
                    "user_id": int(r.user_id),
                    "ts_us": int(r.ts_us),
                    "event_type": r.event_type,
                    "value": float(r.value),
                },
                separators=(",", ":"),
            )
            for r in df.itertuples()
        ]
        data = "\n".join(lines) + "\n"
        tmp = plain + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, plain)
        tmp = gz + ".tmp"
        with gzip.open(tmp, "wt") as f:
            f.write(data)
        os.replace(tmp, gz)
    return plain, gz

def csv_events_paths(sf_dir: str) -> tuple[str, str]:
    """Deterministic CSV twin of {sf_dir}/events.parquet (plus gzip
    copy) — the delimited-text ingest fixture (ts as epoch micros)."""
    import gzip

    os.makedirs(CACHE_DIR, exist_ok=True)
    key = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(CACHE_DIR, f"events_csv_v1_{key}")
    plain, gz = base + ".csv", base + ".csv.gz"
    if not (os.path.exists(plain) and os.path.exists(gz)):
        df = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
        out = df[["event_id", "user_id", "ts_us", "event_type", "value"]]
        tmp = plain + ".tmp"
        out.to_csv(tmp, index=False)
        os.replace(tmp, plain)
        tmp = gz + ".tmp"
        with open(plain, "rb") as src, gzip.open(tmp, "wb") as dst:
            dst.write(src.read())
        os.replace(tmp, gz)
    return plain, gz


def generate_status_transitions(seed: int = 42, n_random: int = 4000) -> pa.Table:
    """Deterministic (current, proposed) status-pair table covering the
    full file- and date-lattice cross products (every transition edge
    of /root/reference/libs/lib_status.py:7-19 appears at least once)
    plus seeded random pairs — the T1/T2 oracle-gate fixture."""
    from .control import status as st

    file_vals = np.array(
        [st.FILE_QUEUE, st.FILE_PARTIAL, st.FILE_LOADED,
         st.FILE_LOADING, st.FILE_FAILED, st.FILE_INVALID],
        dtype=np.int64,
    )
    date_vals = np.array(
        [st.DATE_QUEUE, st.DATE_PARTIAL, st.DATE_LOADED,
         st.DATE_PRETABLE, st.DATE_COMPUTED, st.DATE_COMPLETED],
        dtype=np.int64,
    )
    fc, fp = np.meshgrid(file_vals, file_vals)
    dc, dp = np.meshgrid(date_vals, date_vals)
    rng = np.random.default_rng(seed)
    cur_f = np.concatenate([fc.ravel(), rng.choice(file_vals, n_random)])
    prop_f = np.concatenate([fp.ravel(), rng.choice(file_vals, n_random)])
    cur_d = np.concatenate([dc.ravel(), rng.choice(date_vals, n_random)])
    prop_d = np.concatenate([dp.ravel(), rng.choice(date_vals, n_random)])
    n = len(cur_f)
    return pa.table(
        {
            "row_id": pa.array(np.arange(n, dtype=np.int64)),
            "cur_file": pa.array(cur_f),
            "prop_file": pa.array(prop_f),
            "cur_date": pa.array(cur_d),
            "prop_date": pa.array(prop_d),
        }
    )


def status_transitions_path(seed: int = 42) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"status_transitions_v1_seed{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(generate_status_transitions(seed), tmp, row_group_size=512)
        os.replace(tmp, path)
    return path


def recovery_journal_dir(seed: int = 42, n_partitions: int = 60) -> str:
    """Deterministic recovery-TSV journal directory (T3/K2 fixture):
    per-partition TSVs written through control.recovery.write_recovery_row
    (the REAL appender, so the gate exercises the production writer),
    1-3 rows per partition with seeded counts and status codes."""
    from .control import recovery, status as st

    os.makedirs(CACHE_DIR, exist_ok=True)
    d = os.path.join(CACHE_DIR, f"recovery_journal_v1_seed{seed}")
    if not os.path.isdir(d):
        tmpd = d + ".tmp"
        if os.path.isdir(tmpd):
            import shutil

            shutil.rmtree(tmpd)
        rng = np.random.default_rng(seed)
        statuses = [st.FILE_QUEUE, st.FILE_PARTIAL, st.FILE_LOADED, st.FILE_FAILED]
        for i in range(n_partitions):
            pid = f"part-{i:04d}"
            for _ in range(int(rng.integers(1, 4))):
                expected = int(rng.integers(0, 2_000_000))
                parsed = int(rng.integers(0, expected + 1))
                recovery.write_recovery_row(
                    tmpd, pid, expected, parsed, statuses[int(rng.integers(0, 4))]
                )
        os.replace(tmpd, d)
    return d


def hostile_docs_path() -> str:
    """Hostile documents fixture (VERDICT r4 item 5): empty-string,
    whitespace-only and NULL ``text`` rows, sub-prefix-length docs,
    double-space tokenization traps, and shared/repeated 10-word
    paragraphs — the degenerate inputs the paradedup empty-doc and
    fuzzyjoin prefix-padding/NULL conventions (commit 8edda56) exist
    for. Unioned into the paragraph_dedup_docs and fuzzy_pairs gates so
    the driver grade exercises those conventions, not just the 20-60
    word sf docs. doc_ids start at 9_000_000 — far above any sf range."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, "hostile_docs_v1.parquet")
    if not os.path.exists(path):
        para = " ".join(f"w{i}" for i in range(10))
        rows = [
            None,  # NULL text
            "",  # empty
            "   ",  # whitespace-only
            "\n\n",  # newline-only
            "hello",  # sub-prefix-length (1 word < prefix_words=2)
            "hello",  # exact duplicate of the above
            "hello world",
            "a b",
            "a b c",
            "a  b",  # double space: '' token under split-on-space
            para,  # exactly one 10-word paragraph
            para + " tail words here",  # shares that paragraph
            para + " " + para,  # same paragraph twice IN one doc
            "x",  # single char
        ]
        tmp = path + ".tmp"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        [9_000_000 + i for i in range(len(rows))],
                        type=pa.int64(),
                    ),
                    "text": pa.array(rows, type=pa.string()),
                }
            ),
            tmp,
        )
        os.replace(tmp, path)
    return path


def gc_workspace_dir(seed: int = 42) -> str:
    """Deterministic GC-lifecycle fixture (K3/K4/S4, reference
    proc/clean_data.py:21-58): a workspace with

    - ``pretables/`` — dated ``<date>.tsv`` files (varying sizes) plus
      date-free junk that the lifecycle must leave alone,
    - ``r5/`` — ``r5-metrics-<date>.csv`` files,
    - ``rollup.parquet`` — (collection, date, status) date-status rows
      where only SOME dates are DATE_COMPLETED for 'scl' (and some are
      completed for another collection only — must not clean),
    - ``listing.parquet`` — the pre-GC ground truth (dir, name, date,
      size_bytes) the DuckDB oracle replays the completed-dates
      semi-join against.

    Gates copy the workspace to a scratch dir and run the REAL
    archive/delete paths there, so the cached fixture is never
    consumed."""
    from .control import dates as cdates, status as st

    os.makedirs(CACHE_DIR, exist_ok=True)
    d = os.path.join(CACHE_DIR, f"gc_workspace_v1_seed{seed}")
    if not os.path.isdir(d):
        tmpd = d + ".tmp"
        if os.path.isdir(tmpd):
            import shutil

            shutil.rmtree(tmpd)
        pre = os.path.join(tmpd, "pretables")
        r5 = os.path.join(tmpd, "r5")
        os.makedirs(pre)
        os.makedirs(r5)
        rng = np.random.default_rng(seed)
        base = np.datetime64("2024-01-01")
        date_strs = [str(base + np.timedelta64(i, "D")) for i in range(30)]
        rollup_rows = []
        for i, ds in enumerate(date_strs):
            status = st.DATE_COMPLETED if i % 3 == 0 else st.DATE_COMPUTED
            rollup_rows.append(("scl", ds, status))
            if i % 3 == 1:
                # completed in ANOTHER collection only: must not clean
                rollup_rows.append(("ven", ds, st.DATE_COMPLETED))
        for i, ds in enumerate(date_strs):
            if i % 5 != 4:  # some completed dates have no pretable file
                with open(os.path.join(pre, f"{ds}.tsv"), "w") as f:
                    for k in range(int(rng.integers(3, 40))):
                        f.write(f"{ds}\trow{k}\t{int(rng.integers(0, 9999))}\n")
            if i % 7 != 6:  # and some have no r5 file
                with open(
                    os.path.join(r5, f"r5-metrics-{ds}.csv"), "w"
                ) as f:
                    for k in range(int(rng.integers(1, 12))):
                        f.write(f"{ds},m{k},{int(rng.integers(0, 999))}\n")
        # date-free junk the listing parses to '' and GC must skip
        for junk_dir, junk_name in (
            (pre, "README.txt"),
            (pre, "notes-final.tsv"),
            (r5, "r5-metrics-latest.csv"),
        ):
            with open(os.path.join(junk_dir, junk_name), "w") as f:
                f.write("junk\n")
        pq.write_table(
            pa.table(
                {
                    "collection": pa.array([r[0] for r in rollup_rows]),
                    "date": pa.array([r[1] for r in rollup_rows]),
                    "status": pa.array(
                        [r[2] for r in rollup_rows], type=pa.int64()
                    ),
                }
            ),
            os.path.join(tmpd, "rollup.parquet"),
        )
        listing_rows = []
        for sub in ("pretables", "r5"):
            full = os.path.join(tmpd, sub)
            names = sorted(os.listdir(full))
            parsed = cdates.extract_date(pd.Series(names, dtype=object))
            for name, dt in zip(names, parsed):
                listing_rows.append(
                    (sub, name, dt, os.path.getsize(os.path.join(full, name)))
                )
        pq.write_table(
            pa.table(
                {
                    "dir": pa.array([r[0] for r in listing_rows]),
                    "name": pa.array([r[1] for r in listing_rows]),
                    "date": pa.array([r[2] for r in listing_rows]),
                    "size_bytes": pa.array(
                        [r[3] for r in listing_rows], type=pa.int64()
                    ),
                }
            ),
            os.path.join(tmpd, "listing.parquet"),
        )
        os.replace(tmpd, d)
    return d
