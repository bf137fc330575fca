"""robots.txt parsing and evaluation.

Re-implements, from the public RFC 9309 / Google robots spec and the
reference's observable test behavior, the semantics the reference gets
from the temoto/robotstxt library (reference: worker.go:146-204,
go.mod:10; fixtures testdata/robot{a,b,c}/robots.txt):

- groups are formed by consecutive ``User-agent`` lines followed by
  ``Allow``/``Disallow``/``Crawl-delay`` rules;
- group selection: the group whose agent token is the **longest
  case-insensitive prefix** of the crawler's robot user agent wins;
  fallback to ``*`` (so agent "Googlebot (gocrawl v0.4)" matches group
  "Googlebot" while "NotGoogleBot" does not — tbldef_test.go:599-612);
- rule matching: longest-match wins, Allow wins ties, patterns support
  ``*`` wildcards and a ``$`` end anchor, empty Disallow allows all;
- HTTP status: 2xx → parse; 401/403 → deny all; other 4xx (incl. 404,
  i.e. missing robots.txt) → allow all; 5xx → deny all;
- unparseable body → allow all (reference: worker.go:177-183).

NOT built on urllib.robotparser (its Allow precedence predates the RFC
and disagrees with the reference).

Pure Python; the engine wraps :func:`parse_robots` in a vectorized UDF
producing a broadcastable per-host rules table.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = [
    "RobotsGroup",
    "RobotsRules",
    "parse_robots",
    "robots_from_status_and_body",
    "rules_to_rows",
    "rows_to_group",
]


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    # (pattern, allow) in file order
    rules: list[tuple[str, bool]] = field(default_factory=list)
    crawl_delay_ms: int | None = None

    def test(self, path: str) -> bool:
        """Longest-match Allow/Disallow; allow on no match or tie-break."""
        return _match_rules(self.rules, path)


def _pattern_matches(pattern: str, path: str) -> bool:
    if not pattern:
        return False
    if "*" in pattern or pattern.endswith("$"):
        rx = "^" + re.escape(pattern).replace(r"\*", ".*")
        if rx.endswith(r"\$"):
            rx = rx[:-2] + "$"
        return re.match(rx, path) is not None
    return path.startswith(pattern)


def _match_rules(rules: list[tuple[str, bool]], path: str) -> bool:
    best_len = -1
    best_allow = True
    for pattern, allow in rules:
        if not pattern:
            # "Disallow:" (empty) means allow everything; contributes nothing
            continue
        if _pattern_matches(pattern, path):
            # specificity = pattern length; Allow wins ties (Google spec)
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len = plen
                best_allow = allow
    return best_allow if best_len >= 0 else True


@dataclass
class RobotsRules:
    """Parsed robots.txt: groups + global allow/deny overrides."""

    groups: list[RobotsGroup] = field(default_factory=list)
    allow_all: bool = False
    deny_all: bool = False

    def find_group(self, robot_agent: str) -> RobotsGroup | None:
        """Longest agent-token prefix match; '*' fallback; None = no rules."""
        agent_lower = robot_agent.lower()
        best: RobotsGroup | None = None
        best_len = -1
        star: RobotsGroup | None = None
        for g in self.groups:
            for a in g.agents:
                al = a.lower()
                if a == "*":
                    if star is None:
                        star = g
                elif agent_lower.startswith(al) and len(al) > best_len:
                    best = g
                    best_len = len(al)
        return best if best is not None else star

    def allowed(self, robot_agent: str, path: str) -> bool:
        if self.allow_all:
            return True
        if self.deny_all:
            return False
        g = self.find_group(robot_agent)
        if g is None:
            return True  # no matching group → allow (worker.go:177-186)
        return g.test(path)

    def crawl_delay_ms(self, robot_agent: str) -> int | None:
        if self.allow_all or self.deny_all:
            return None
        g = self.find_group(robot_agent)
        return g.crawl_delay_ms if g is not None else None


_LINE_RX = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*(?:#.*)?$")


def parse_robots(body: str | bytes | None) -> RobotsRules:
    """Parse a robots.txt body into grouped rules (allow-all on None)."""
    if body is None:
        return RobotsRules(allow_all=True)
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")

    rules = RobotsRules()
    current: RobotsGroup | None = None
    collecting_agents = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        m = _LINE_RX.match(line)
        if not m:
            continue
        key = m.group(1).lower()
        val = m.group(2).strip()
        if key == "user-agent":
            if not collecting_agents:
                current = RobotsGroup()
                rules.groups.append(current)
                collecting_agents = True
            current.agents.append(val)
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if current is None:
                # rules before any user-agent line: implicit '*' group
                current = RobotsGroup(agents=["*"])
                rules.groups.append(current)
            current.rules.append((val, key == "allow"))
        elif key == "crawl-delay":
            collecting_agents = False
            if current is not None:
                try:
                    current.crawl_delay_ms = int(float(val) * 1000)
                except ValueError:
                    pass
        else:
            collecting_agents = False
    return rules


def robots_from_status_and_body(status: int, body: bytes | str | None) -> RobotsRules:
    """Status-aware construction mirroring the reference's library."""
    if 200 <= status < 300:
        try:
            return parse_robots(body)
        except Exception:
            return RobotsRules(allow_all=True)
    if status in (401, 403):
        return RobotsRules(deny_all=True)
    if 400 <= status < 500:
        return RobotsRules(allow_all=True)  # includes 404: no robots.txt
    return RobotsRules(deny_all=True)  # 5xx: be conservative


# --- flat-row (de)serialization for the Spark rules table ---------------

def rules_to_rows(rules: RobotsRules, robot_agent: str) -> list[dict]:
    """Pre-select the group for the configured agent and flatten it to
    rows ``(pattern, allow, order)`` suitable for a per-host rules table.
    A special row pattern='' carries allow_all/deny_all/crawl_delay."""
    rows: list[dict] = []
    if rules.allow_all or rules.deny_all:
        rows.append(
            {"pattern": "", "allow": bool(rules.allow_all), "order": -1,
             "crawl_delay_ms": None, "terminal": True}
        )
        return rows
    g = rules.find_group(robot_agent)
    if g is None:
        rows.append(
            {"pattern": "", "allow": True, "order": -1,
             "crawl_delay_ms": None, "terminal": True}
        )
        return rows
    rows.append(
        {"pattern": "", "allow": True, "order": -1,
         "crawl_delay_ms": g.crawl_delay_ms, "terminal": False}
    )
    for i, (pattern, allow) in enumerate(g.rules):
        rows.append(
            {"pattern": pattern, "allow": allow, "order": i,
             "crawl_delay_ms": None, "terminal": False}
        )
    return rows


def rows_to_group(rows: list[dict]) -> tuple[list[tuple[str, bool]], int | None, bool | None]:
    """Inverse of :func:`rules_to_rows` → (rules, crawl_delay_ms, terminal_allow).

    ``terminal_allow`` is True/False for allow-all/deny-all robots, else None.
    """
    delay = None
    terminal: bool | None = None
    out: list[tuple[str, bool]] = []
    for r in sorted(rows, key=lambda r: r["order"]):
        if r["order"] == -1:
            if r.get("terminal"):
                terminal = bool(r["allow"])
            if r.get("crawl_delay_ms") is not None:
                delay = int(r["crawl_delay_ms"])
            continue
        out.append((r["pattern"], bool(r["allow"])))
    return out, delay, terminal


def match_rows(rows: list[dict], path: str) -> bool:
    rules, _, terminal = rows_to_group(rows)
    if terminal is not None:
        return terminal
    return _match_rules(rules, path)
