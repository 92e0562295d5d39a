"""FK-dependency DAG planning — the runconfigs analog.

The reference plans per-table run configs over the FK graph: cycle
detection (DFS over all cycles, /root/reference/internal/runconfigs/
circular-dependencies.go:8-17), insert/update split for cycles
(builder.go:286-455), and topological feasibility validation
(runconfigs.go:296-325). The transcript engine is single-table, but the
planner is part of the capability surface: multi-table sync jobs order
their table loads with it.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableRunConfig:
    """One unit of work: load `table`, either fully (run_type=insert)
    or as the deferred nullable-FK update pass of a cycle member
    (run_type=update) — mirroring the reference RunType split."""

    table: str
    run_type: str  # 'insert' | 'update'
    depends_on: tuple[str, ...] = ()
    update_columns: tuple[str, ...] = ()

    @property
    def name(self) -> str:
        return f"{self.table}.{self.run_type}"


@dataclass
class FkGraph:
    # child -> list of (parent, fk_col, nullable)
    edges: dict[str, list[tuple[str, str, bool]]] = field(default_factory=dict)

    def add(self, child: str, parent: str, fk_col: str, nullable: bool = False):
        self.edges.setdefault(child, []).append((parent, fk_col, nullable))
        self.edges.setdefault(parent, [])
        return self

    def tables(self) -> list[str]:
        return sorted(self.edges)


def find_cycles(g: FkGraph) -> list[list[str]]:
    """All elementary dependency cycles (child depends on parent)."""
    cycles: list[list[str]] = []
    seen: set[tuple[str, ...]] = set()

    def dfs(node: str, path: list[str], on_path: set[str]):
        for parent, _, _ in g.edges.get(node, ()):
            if parent in on_path:
                i = path.index(parent)
                cyc = path[i:]
                key = tuple(sorted(cyc))
                if key not in seen:
                    seen.add(key)
                    cycles.append(cyc)
                continue
            dfs(parent, path + [parent], on_path | {parent})

    for t in g.tables():
        dfs(t, [t], {t})
    return cycles


def plan_run_configs(g: FkGraph) -> list[TableRunConfig]:
    """Topologically ordered run configs; cycles are broken by loading
    cycle members without their nullable FK columns first (insert) and
    patching those columns afterwards (update) — the reference's
    decomposition. Raises on a cycle with no nullable FK to break."""
    cycles = find_cycles(g)
    in_cycle = {t for c in cycles for t in c}

    # choose break edges: per cycle, a nullable FK edge must exist
    deferred: dict[str, list[str]] = {}
    broken: set[tuple[str, str]] = set()
    for cyc in cycles:
        members = set(cyc)
        breakable = [
            (child, parent, col)
            for child in cyc
            for parent, col, nullable in g.edges.get(child, ())
            if nullable and parent in members
        ]
        if not breakable:
            raise ValueError(f"unbreakable FK cycle (no nullable edge): {cyc}")
        child, parent, col = breakable[0]
        broken.add((child, parent))
        deferred.setdefault(child, []).append(col)

    # Kahn topo sort over unbroken edges
    deps = {
        t: {p for p, _, _ in g.edges.get(t, ()) if (t, p) not in broken and p != t}
        for t in g.tables()
    }
    order: list[str] = []
    ready = sorted(t for t, d in deps.items() if not d)
    while ready:
        t = ready.pop(0)
        order.append(t)
        for u in sorted(deps):
            if t in deps[u]:
                deps[u].discard(t)
                if not deps[u] and u not in order and u not in ready:
                    ready.append(u)
        ready.sort()
    if len(order) != len(g.tables()):
        raise ValueError("dependency graph is not satisfiable after cycle breaking")

    configs = [
        TableRunConfig(
            t,
            "insert",
            depends_on=tuple(
                sorted(p for p, _, _ in g.edges.get(t, ()) if (t, p) not in broken and p != t)
            ),
        )
        for t in order
    ]
    for child, cols in sorted(deferred.items()):
        configs.append(
            TableRunConfig(
                child,
                "update",
                depends_on=tuple(
                    sorted({p for p, _, _ in g.edges.get(child, ())} | {child})
                ),
                update_columns=tuple(sorted(cols)),
            )
        )
    return configs


def runnable_waves(configs: list[TableRunConfig]) -> list[list[str]]:
    """Group configs into dependency-satisfied waves (the reference's
    groupConfigsByDependency / concurrency scheduling — waves run
    sequentially, members of a wave in parallel)."""
    done: set[str] = set()
    waves: list[list[str]] = []
    remaining = list(configs)
    while remaining:
        wave = [
            c
            for c in remaining
            if all(d in done for d in c.depends_on if d != c.table)
            and (c.run_type == "insert" or c.table in done)
        ]
        if not wave:
            raise ValueError("deadlock in run configs")
        waves.append([c.name for c in wave])
        done.update(c.table for c in wave if c.run_type == "insert")
        remaining = [c for c in remaining if c not in wave]
    return waves
