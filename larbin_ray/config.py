"""Crawl configuration.

Mirrors the reference's config surface (keys + code defaults from
/root/reference/src/global.cxx:69-119 initializers and 157-166 standard
values; config keys parsed at global.cxx:250-418).  The shipped
``larbin.conf`` profile differs from code defaults (depthBySite on,
waitDuration 60, 100 connections); :func:`CrawlConfig.larbin_conf_profile`
reproduces it.
"""

from __future__ import annotations

from dataclasses import dataclass


# forbiddenExtensions block of /root/reference/larbin.conf (lowercased at
# parse time, global.cxx:441-458).
DEFAULT_FORBIDDEN_EXTENSIONS: tuple[str, ...] = (
    ".tar", ".gz", ".tgz", ".zip", ".z", ".rpm", ".deb",
    ".ps", ".dvi", ".pdf",
    ".png", ".jpg", ".jpeg", ".bmp", ".smi", ".tiff", ".gif",
    ".mov", ".avi", ".mpeg", ".mpg", ".mp3", ".qt", ".wav", ".ram", ".rm",
    ".jar", ".java", ".class", ".diff",
    ".doc", ".xls", ".ppt", ".mdb", ".rtf", ".exe", ".pps", ".so", ".psd",
)

# Hard capacity constants, reference src/types.h.
HASH_SIZE = 64_000_000        # types.h:26 — URL-seen bitset size (bits)
DUP_SIZE = HASH_SIZE          # types.h:31
NAMED_SITE_LIST_SIZE = 20_000  # types.h:35 — modulus of hostHashCode
MAX_URLS_BY_SITE = 64         # types.h:43 — per-host RAM ring
MAX_URL_SIZE = 1024           # types.h:76
MAX_SITE_SIZE = 256           # types.h:77
MAX_PAGE_SIZE = 8 * 1024 * 1024   # types.h:53
MAX_ROBOTS_SIZE = 64 * 1024   # types.h:58
MAX_ROBOTS_ITEM = 256         # types.h:61
MAX_COOKIE_SIZE = 128         # types.h:80


@dataclass
class CrawlConfig:
    """Settings a Larbin config file can express (global.cxx:250-418).

    Defaults are the *code* defaults (global.cxx:69-119,157-166), not the
    shipped larbin.conf.
    """

    user_agent: str = "larbin"                  # global.cxx:160
    sender: str = "larbin@unspecified.mail"     # global.cxx:161
    start_urls: tuple[str, ...] = ()            # startUrl lines
    wait_duration: int = 60                     # global.cxx:158 (seconds/IP)
    depth_in_site: int = 5                      # global.cxx:159
    nb_conn: int = 20                           # pagesConnexions, global.cxx:162
    dns_conn: int = 3                           # dnsConnexions, global.cxx:163
    limit_to_domains: tuple[str, ...] | None = None  # limitToDomain block
    forbidden_extensions: tuple[str, ...] = DEFAULT_FORBIDDEN_EXTENSIONS
    external_links: bool = True                 # noExternalLinks inverts
    ignore_robots: bool = False
    depth_by_site: bool = False
    use_cookies: bool = False
    get_image: bool = False
    get_cgi: bool = False
    any_type: bool = False
    punycode: bool = False
    page_no_duplicate: bool = False
    specific_search: bool = False
    # specificSet block: parallel (content-type, privileged extension) lists
    content_types: tuple[str, ...] = ()
    privileged_exts: tuple[str, ...] = ()
    lock_site: bool = False
    limit_page: int = 0                         # 0 = unlimited
    limit_time: int = 0                         # seconds of simulated time
    # per-host RAM cap (maxUrlsBySite, types.h:43 + site.cxx:136-175):
    # a host holding this many urls overflows new ones to a wait fifo
    # that is recycled through admission at each tick start
    # (main.cxx:190-199 / sequencer readWait).  0 = unlimited.
    max_urls_by_site: int = 0
    # per-IP per-tick dispatch budget in drain mode (the sequencer /
    # Interval analog, sequencer.cxx:36-54 + types.h:39): bounds how
    # much of an IP queue one tick may drain, so a viral host cannot
    # produce an unbounded generation.  0 = drain fully.
    max_dispatch_per_ip: int = 0
    # timeout model (types.h:46-47 + fetch_pipe.cxx:48-72): a fetch is
    # allowed timeout_page seconds plus 1 s per timeout_incr bytes
    # delivered; a pages-table row whose latency_ms exceeds that budget
    # classifies as the `timeout` FetchError
    timeout_page: int = 30
    timeout_incr: int = 2000

    # ---- engine-side knobs (no reference equivalent; scale tuning) ----
    num_scheduler_shards: int = 8    # host/IP scheduler actor pool size
    num_seen_shards: int = 4         # URL-seen bitset shard actors
    fetch_concurrency: int = 4       # fetch-join actor pool
    # pages-table publication (stages/fetch.py): 1 = single broadcast
    # object + per-worker full url index (small-corpus fast path);
    # B > 1 = hash-partition into B hash64(url)%B buckets, workers hold
    # only touched buckets under an LRU cap; 0 = auto — one bucket per
    # fetch_bucket_bytes of html so a corpus bigger than a comfortable
    # broadcast partitions itself.  Both paths are output-identical
    # (tests/test_fetch_buckets.py).
    fetch_num_buckets: int = 0
    fetch_bucket_bytes: int = 4 << 30
    # bucketed-fetch backend: None = one object-store entry per bucket;
    # a directory path = the real-100-TB form — put_pages runs a
    # distributed write_parquet(partition_cols=["bucket"]) job and
    # workers read bucket directories lazily (no driver-side partition
    # pass, no corpus in plasma).  Output-identical to the object-store
    # backend (tests/test_fetch_buckets.py).
    fetch_parquet_dir: str | None = None
    # rows per fetch+parse task/batch.  0 = auto: size tasks to the
    # EXECUTOR, not the data — ceil(tick_rows / (2 x cluster CPUs)),
    # clamped to [512, 16384], so a tick always yields ~2 waves of
    # tasks per CPU regardless of tick volume.  A fixed small batch at
    # design-scale tick volume (30k+ rows) pays per-task submit +
    # return-ref fan-out (1 + num_scheduler_shards returns per task)
    # that binds the driver long before the workers saturate; output
    # is batch-size-invariant (test_parse_batch_size_invariance).
    parse_batch_size: int = 256
    # ticks with at least this many rows run fetch+parse as a Ray Data
    # streaming pipeline instead of plain tasks (same batch function,
    # oracle-parity-tested either way).  Measured single-node (round 4,
    # BASELINE.md): the task path wins 2.4-3x at BOTH 40k- and
    # 250k-row ticks — the old 65536 default silently routed exactly
    # the biggest design-scale ticks through the slower path (3.2 s/tick
    # of streaming-executor fixed cost).  Default = off; set a finite
    # threshold on a multi-node cluster, where map_batches blocks stay
    # on their nodes' plasma stores while task returns all funnel
    # through the one driver.
    ray_data_min_tick_rows: int = 1 << 40
    max_ticks: int = 100_000         # safety valve on the generation loop
    checkpoint_every: int = 0        # write frontier/seen snapshot every N ticks (0=off)

    @staticmethod
    def larbin_conf_profile(**overrides) -> "CrawlConfig":
        """The shipped /root/reference/larbin.conf settings."""
        base = dict(
            user_agent="larbin_2.6.5",
            sender="larbin@unspecified.mail",
            wait_duration=60,
            depth_in_site=5,
            nb_conn=100,
            dns_conn=5,
            depth_by_site=True,
            specific_search=False,  # conf has a specificSet block but no specificSearch key
            content_types=("audio/mpge", "image/jpeg"),
            privileged_exts=(".mp3", ".jpg"),
        )
        base.update(overrides)
        return CrawlConfig(**base)

    def forbidden_ext_bytes(self) -> tuple[bytes, ...]:
        return tuple(e.lower().encode() for e in self.forbidden_extensions)

    def domains_bytes(self) -> tuple[bytes, ...] | None:
        if self.limit_to_domains is None:
            return None
        return tuple(d.encode() for d in self.limit_to_domains)
