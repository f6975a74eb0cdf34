"""Larbin configuration-file parser (M21): the keyword grammar of
/root/reference/src/global.cxx:250-418 with the block forms
``limitToDomain`` / ``forbiddenExtensions`` / ``specificSet`` and the
``#``-comment stripping of global.cxx:261-275, producing a CrawlConfig.

Differences from the reference on purpose: ``startUrl`` entries are
collected (not immediately admitted — the engine takes seeds as an
argument); network-only keys (proxy, httpPort, inputPort, bondWidth)
are parsed and recorded but have no effect in fixture-fetch mode.
"""

from __future__ import annotations

from dataclasses import replace

from larbin_ray.config import CrawlConfig


def _tokens(text: str):
    # comment stripping per global.cxx:261-275: '#' blanks to end of line
    out = []
    for line in text.split("\n"):
        hash_pos = line.find("#")
        if hash_pos != -1:
            line = line[:hash_pos]
        i = 0
        while i < len(line):
            if line[i].isspace():
                i += 1
                continue
            if line[i] == '"':
                j = line.find('"', i + 1)
                j = len(line) if j == -1 else j
                out.append(line[i + 1:j])
                i = j + 1
            else:
                j = i
                while j < len(line) and not line[j].isspace():
                    j += 1
                out.append(line[i:j])
                i = j
    return out


_FLAGS = {
    "noexternallinks": ("external_links", False),
    "ignorerobots": ("ignore_robots", True),
    "depthbysite": ("depth_by_site", True),
    "usecookies": ("use_cookies", True),
    "getimage": ("get_image", True),
    "getcgi": ("get_cgi", True),
    "anytype": ("any_type", True),
    "punycode": ("punycode", True),
    "pagenoduplicate": ("page_no_duplicate", True),
    "specificsearch": ("specific_search", True),
    "locksite": ("lock_site", True),
    # flags without engine-side behavior (accepted, recorded as no-ops)
    "highlevelwebserver": (None, None),
    "printstats": (None, None),
    "histograms": (None, None),
    "fetchinfo": (None, None),
    "debug": (None, None),
    "canreload": (None, None),
}

_INTS = {
    "waitduration": "wait_duration",
    "depthinsite": "depth_in_site",
    "pagesconnexions": "nb_conn",
    "dnsconnexions": "dns_conn",
    "limitpage": "limit_page",
}


def parse_larbin_conf(text: str) -> tuple[CrawlConfig, list[str]]:
    """-> (config, seed urls).  Raises ValueError on unknown keywords,
    like the reference exits (global.cxx:412-416)."""
    cfg = CrawlConfig(forbidden_extensions=())
    seeds: list[str] = []
    toks = _tokens(text)
    i = 0
    updates: dict = {}
    forb: list[str] = []
    domains: list[str] = []
    ctypes: list[str] = []
    pexts: list[str] = []

    def take() -> str:
        nonlocal i
        if i >= len(toks):
            raise ValueError("unexpected end of config")
        t = toks[i]
        i += 1
        return t

    while i < len(toks):
        key = take().lower()
        if key in _FLAGS:
            field, val = _FLAGS[key]
            if field:
                updates[field] = val
        elif key in _INTS:
            updates[_INTS[key]] = int(take())
        elif key == "useragent":
            updates["user_agent"] = take()
        elif key == "from":
            updates["sender"] = take()
        elif key == "starturl":
            seeds.append(take())
        elif key == "limittime":
            updates["limit_time"] = int(take()) * 60   # minutes, global.cxx:404
        elif key == "outputmode":
            take()   # sink selection is an engine argument
        elif key in ("httpport", "inputport", "bondwidth"):
            take()   # network-only keys: accepted, no effect here
        elif key == "proxy":
            take(), take()
        elif key == "limittodomain":
            while (t := take()).lower() != "end":
                domains.append(t)
        elif key == "forbiddenextensions":
            while (t := take()).lower() != "end":
                forb.append(t.lower())    # lowercased, global.cxx:446-448
        elif key == "specificset":
            while True:
                a = take()
                if a.lower() == "end":
                    take()   # "end end"
                    break
                ctypes.append(a)
                pexts.append(take())
        else:
            raise ValueError(f"bad configuration file : {key}")
    if domains:
        updates["limit_to_domains"] = tuple(domains)
    updates["forbidden_extensions"] = tuple(forb)
    if ctypes:
        updates["content_types"] = tuple(ctypes)
        updates["privileged_exts"] = tuple(pexts)
    return replace(cfg, **updates), seeds
