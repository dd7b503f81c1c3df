"""Resource catalog: the logical schema system.

Mirrors the reference's resource graph (SURVEY.md §1.1):
``(name, variant)``-addressed immutable resources typed FEATURE /
LABEL / SOURCE / TRAINING_SET / ENTITY / ON_DEMAND — reference protos
``metadata/proto/metadata.proto:254-500``, Go registry
``metadata/metadata.go:56-71``, provider-side ``ResourceID``
``provider/offline.go:83-87``.

The reference spreads this across a gRPC metadata server + etcd; in a
single-process Spark engine it collapses to an in-memory dict keyed by
``(name, variant, type)`` with dependency-ordered (lazy) DataFrame
construction — the five boundary crossings of the reference lifecycle
(SURVEY.md §3.1) become plain Python calls.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import timedelta
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class ResourceNotFound(KeyError):
    pass


class ResourceExists(ValueError):
    pass


@dataclass(frozen=True)
class Entity:
    """A join-key namespace — proto Entity (metadata.proto:446)."""

    name: str
    description: str = ""


@dataclass(frozen=True)
class User:
    """Ownership metadata — resource type USER (metadata.go:56-71);
    every reference resource carries an owner, tracked here as a
    registry object so manifests round-trip attribution."""

    name: str


@dataclass(frozen=True)
class Provider:
    """Compute/store backend descriptor — resource type PROVIDER
    (metadata.go:56-71). This engine has exactly one live provider
    (the in-process Spark session), but registry parity keeps
    definitions written against the reference portable."""

    name: str
    provider_type: str = "SPARK_OFFLINE"
    description: str = ""


@dataclass(frozen=True)
class Model:
    """Model metadata — resource type MODEL (metadata.go:56-71):
    records which features/training sets a model consumes (the
    serving-side attribution the reference's `client.features(...,
    model=...)` logs). Pure metadata — no computation attaches."""

    name: str
    description: str = ""
    features: tuple = ()
    training_sets: tuple = ()


@dataclass(frozen=True)
class SourceVariant:
    """PrimaryData or Transformation — metadata.proto:500,562-655.

    Exactly one of ``path``/``table``/``query``/``fn`` is set:
      - path + fmt: PrimaryData file (FileStoreTable)
      - table: PrimaryData catalog table (CatalogTable)
      - query + inputs: SQLTransformation with {{name.variant}} refs
      - fn + inputs: DFTransformation (plain callable, no dill needed
        in-process — reference pickles it, metadata.proto:617-629)
    """

    name: str
    variant: str
    path: str | None = None
    fmt: str = "parquet"
    table: str | None = None
    query: str | None = None
    fn: Callable[..., DataFrame] | None = None
    inputs: tuple[tuple[str, str], ...] = ()
    timestamp_column: str | None = None
    options: tuple[tuple[str, str], ...] = ()

    @property
    def is_transformation(self) -> bool:
        return self.query is not None or self.fn is not None


@dataclass(frozen=True)
class ColumnMapping:
    """Projection of a source into the canonical (entity, value, ts)
    triple — proto ``Columns{entity, value, ts}`` metadata.proto:214-218,
    ``ResourceSchema`` provider/offline.go:721-727."""

    entity: str
    value: str
    ts: str | None = None


@dataclass(frozen=True)
class EntityMapping:
    """Composite-entity mapping for labels —
    ``EntityMappings{mappings:[{name, entity_column}]}``
    metadata.proto:372-381."""

    name: str
    entity_column: str


@dataclass(frozen=True)
class FeatureVariant:
    name: str
    variant: str
    source: tuple[str, str]
    columns: ColumnMapping
    entity: str = "entity"


@dataclass(frozen=True)
class LabelVariant:
    name: str
    variant: str
    source: tuple[str, str]
    columns: ColumnMapping
    entity: str = "entity"
    entity_mappings: tuple[EntityMapping, ...] = ()


@dataclass(frozen=True)
class FeatureLag:
    """Lag feature spec — proto FeatureLag metadata.proto:330-335,
    provider/offline.go:160-165. ``lag`` shifts the as-of cutoff:
    value as of ``label_ts - lag``."""

    feature: str
    variant: str
    lag: timedelta
    alias: str | None = None


@dataclass(frozen=True)
class TrainingSetVariant:
    """1 label + N features (+ lags) — TrainingSetDef
    provider/offline.go:167-180."""

    name: str
    variant: str
    label: tuple[str, str]
    features: tuple[tuple[str, str], ...]
    lags: tuple[FeatureLag, ...] = ()


@dataclass(frozen=True)
class OnDemandFeature:
    """CLIENT_COMPUTED feature: plain Python fn evaluated at serve
    time — metadata.proto:220-232, client exec serving.py:236-241.

    ``batch_fn`` is the Spark-idiomatic bulk form: a function of the
    request DataFrame returning a Column, applied JVM-side via
    ``withColumn`` (the per-request ``fn`` stays the V3 serving path;
    a row-at-a-time UDF wrapper would be the slow path and is
    deliberately not provided)."""

    name: str
    variant: str
    fn: Callable[..., Any]
    batch_fn: Callable[[DataFrame], Any] | None = None


class Catalog:
    """In-memory resource registry + dependency-ordered evaluation.

    Replaces the reference's metadata server + coordinator
    (coordinator/scheduler.go:52-79): ``dataframe()`` resolves a
    source's input DAG recursively; results are cached as temp views
    so shared upstreams evaluate once (materialization reuse,
    provider/spark.go:275-292).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._sources: dict[tuple[str, str], SourceVariant] = {}
        self._features: dict[tuple[str, str], FeatureVariant] = {}
        self._labels: dict[tuple[str, str], LabelVariant] = {}
        self._training_sets: dict[tuple[str, str], TrainingSetVariant] = {}
        self._entities: dict[str, Entity] = {}
        self._on_demand: dict[tuple[str, str], OnDemandFeature] = {}
        self._users: dict[str, User] = {}
        self._providers: dict[str, Provider] = {}
        self._models: dict[str, Model] = {}
        self._df_cache: dict[tuple[str, str], DataFrame] = {}

    # -- registration (append-only: redefinition needs a new variant,
    #    like the reference's equivalence check metadata/metadata.go:1927+)

    def _put(self, store: dict, key, value, kind: str):
        if key in store and store[key] != value:
            raise ResourceExists(f"{kind} {key} already registered with a different definition")
        store[key] = value

    def register_entity(self, name: str, description: str = "") -> Entity:
        e = Entity(name, description)
        self._put(self._entities, name, e, "entity")
        return e

    def register_source(self, source: SourceVariant) -> SourceVariant:
        self._put(self._sources, (source.name, source.variant), source, "source")
        return source

    def register_user(self, name: str) -> User:
        u = User(name)
        self._put(self._users, name, u, "user")
        return u

    def register_provider(
        self, name: str, provider_type: str = "SPARK_OFFLINE", description: str = ""
    ) -> Provider:
        p = Provider(name, provider_type, description)
        self._put(self._providers, name, p, "provider")
        return p

    def register_model(
        self,
        name: str,
        description: str = "",
        features: list[tuple[str, str]] | None = None,
        training_sets: list[tuple[str, str]] | None = None,
    ) -> Model:
        """MODEL resource: validates the referenced features/training
        sets exist (the reference's metadata server does the same
        equivalence check), then records the consumption edges."""
        for fk in features or []:
            self.feature(*fk)
        for tk in training_sets or []:
            self.training_set(*tk)
        mdl = Model(
            name, description,
            tuple(tuple(f) for f in (features or [])),
            tuple(tuple(t) for t in (training_sets or [])),
        )
        self._put(self._models, name, mdl, "model")
        return mdl

    def model(self, name: str) -> Model:
        try:
            return self._models[name]
        except KeyError:
            raise ResourceNotFound(f"model {name}") from None

    def models_using(self, feature: tuple[str, str]) -> list[Model]:
        """Reverse attribution: which registered models consume this
        feature (the dashboard lineage view of the reference)."""
        key = tuple(feature)
        return [m for m in self._models.values() if key in m.features]

    def register_file(
        self,
        name: str,
        variant: str,
        path: str,
        fmt: str = "parquet",
        timestamp_column: str | None = None,
        **options: str,
    ) -> SourceVariant:
        return self.register_source(
            SourceVariant(
                name=name,
                variant=variant,
                path=path,
                fmt=fmt,
                timestamp_column=timestamp_column,
                options=tuple(options.items()),
            )
        )

    def sql_transformation(
        self, name: str, variant: str, query: str, inputs: list[tuple[str, str]] | None = None
    ) -> SourceVariant:
        """C1: user SQL over ``{{name.variant}}`` templated sources."""
        from embeddinghub_spark.operators.transform import referenced_sources

        ins = tuple(inputs) if inputs is not None else referenced_sources(query)
        return self.register_source(
            SourceVariant(name=name, variant=variant, query=query, inputs=ins)
        )

    def df_transformation(
        self, name: str, variant: str, fn: Callable[..., DataFrame], inputs: list[tuple[str, str]]
    ) -> SourceVariant:
        """C2: user Python fn of input DataFrames."""
        return self.register_source(
            SourceVariant(name=name, variant=variant, fn=fn, inputs=tuple(inputs))
        )

    def register_feature(
        self,
        name: str,
        variant: str,
        source: tuple[str, str],
        entity_column: str,
        value_column: str,
        timestamp_column: str | None = None,
        entity: str = "entity",
    ) -> FeatureVariant:
        f = FeatureVariant(
            name=name,
            variant=variant,
            source=source,
            columns=ColumnMapping(entity_column, value_column, timestamp_column),
            entity=entity,
        )
        self._put(self._features, (name, variant), f, "feature")
        return f

    def register_label(
        self,
        name: str,
        variant: str,
        source: tuple[str, str],
        entity_column: str,
        value_column: str,
        timestamp_column: str | None = None,
        entity: str = "entity",
        entity_mappings: list[EntityMapping] | None = None,
    ) -> LabelVariant:
        lbl = LabelVariant(
            name=name,
            variant=variant,
            source=source,
            columns=ColumnMapping(entity_column, value_column, timestamp_column),
            entity=entity,
            entity_mappings=tuple(entity_mappings or ()),
        )
        self._put(self._labels, (name, variant), lbl, "label")
        return lbl

    def register_training_set(
        self,
        name: str,
        variant: str,
        label: tuple[str, str],
        features: list[tuple[str, str]],
        lags: list[FeatureLag] | None = None,
    ) -> TrainingSetVariant:
        ts = TrainingSetVariant(
            name=name,
            variant=variant,
            label=label,
            features=tuple(features),
            lags=tuple(lags or ()),
        )
        self._put(self._training_sets, (name, variant), ts, "training_set")
        return ts

    def register_on_demand(
        self,
        name: str,
        variant: str,
        fn: Callable[..., Any],
        batch_fn: Callable[[DataFrame], Any] | None = None,
    ) -> OnDemandFeature:
        od = OnDemandFeature(name, variant, fn, batch_fn)
        self._put(self._on_demand, (name, variant), od, "on_demand_feature")
        return od

    def apply_on_demand_batch(
        self, name: str, variant: str, df: DataFrame, out_col: str | None = None
    ) -> DataFrame:
        """C19 in bulk: evaluate an on-demand feature over a whole
        DataFrame as a JVM column expression (the vectorized twin of
        the per-request path, serving.py:236-241)."""
        od = self.on_demand(name, variant)
        if od.batch_fn is None:
            raise ValueError(
                f"on_demand {name}.{variant} has no batch form; serve it "
                "per-request via OnlineStore.features"
            )
        return df.withColumn(
            out_col or f"ondemand__{name}__{variant}", od.batch_fn(df)
        )

    # -- lookup

    def source(self, name: str, variant: str) -> SourceVariant:
        try:
            return self._sources[(name, variant)]
        except KeyError:
            raise ResourceNotFound(f"source {name}.{variant}") from None

    def feature(self, name: str, variant: str) -> FeatureVariant:
        try:
            return self._features[(name, variant)]
        except KeyError:
            raise ResourceNotFound(f"feature {name}.{variant}") from None

    def label(self, name: str, variant: str) -> LabelVariant:
        try:
            return self._labels[(name, variant)]
        except KeyError:
            raise ResourceNotFound(f"label {name}.{variant}") from None

    def training_set(self, name: str, variant: str) -> TrainingSetVariant:
        try:
            return self._training_sets[(name, variant)]
        except KeyError:
            raise ResourceNotFound(f"training_set {name}.{variant}") from None

    def on_demand(self, name: str, variant: str) -> OnDemandFeature:
        try:
            return self._on_demand[(name, variant)]
        except KeyError:
            raise ResourceNotFound(f"on_demand {name}.{variant}") from None

    # -- evaluation (the "coordinator": topo-ordered lazy DAG walk)

    def dataframe(self, name: str, variant: str) -> DataFrame:
        """Resolve a source to a DataFrame, evaluating its input DAG.

        Primary sources read files/tables (S1/S2); transformations
        render {{name.variant}} to temp views + spark.sql (C1,
        mirroring offline_store_spark_runner.py:876-886) or call the
        user fn (C2, runner :1112-1230).
        """
        key = (name, variant)
        if key in self._df_cache:
            return self._df_cache[key]
        src = self.source(name, variant)
        if src.is_transformation:
            input_dfs = [self.dataframe(n, v) for (n, v) in src.inputs]
            if src.query is not None:
                from embeddinghub_spark.operators.transform import run_sql_transformation

                df = run_sql_transformation(self.spark, src.query, src.inputs, input_dfs)
            else:
                from embeddinghub_spark.operators.transform import run_df_transformation

                df = run_df_transformation(src.fn, input_dfs)
        else:
            from embeddinghub_spark.sources.readers import read_primary

            df = read_primary(self.spark, src)
        self._df_cache[key] = df
        return df

    def feature_table(self, name: str, variant: str) -> DataFrame:
        """C16: project a feature's source into (entity, value, ts)."""
        from embeddinghub_spark.operators.register import resource_table

        f = self.feature(name, variant)
        return resource_table(self.dataframe(*f.source), f.columns)

    def label_table(self, name: str, variant: str) -> DataFrame:
        from embeddinghub_spark.operators.register import label_resource_table

        lbl = self.label(name, variant)
        return label_resource_table(
            self.dataframe(*lbl.source), lbl.columns, lbl.entity_mappings
        )

    def training_set_dataframe(self, name: str, variant: str) -> DataFrame:
        """Entry point C (SURVEY §3.3): build the PIT training set."""
        from embeddinghub_spark.operators.pit import build_training_set

        return build_training_set(self, self.training_set(name, variant))

    def invalidate(self, name: str, variant: str) -> None:
        """C18 refresh support: drop cached DF so next access recomputes."""
        self._df_cache.pop((name, variant), None)

    # -- lineage (the reference dashboard's resource DAG,
    #    metadata/metadata.go resource graph; models_using is the
    #    single-hop reverse view, this is the full edge set) --------

    def lineage_edges(self) -> list[tuple[str, str, str, str]]:
        """Every dependency edge in the registry as
        ``(upstream_type, upstream_key, downstream_type,
        downstream_key)`` — downstream CONSUMES upstream. Keys render
        as ``name.variant`` (bare ``name`` for models). Driver-side
        metadata (the registry is in-memory by design); feed it to a
        DataFrame/graphviz for the dashboard view, or walk it with
        ``upstream_closure`` for impact analysis."""
        def k(name: str, variant: str) -> str:
            return f"{name}.{variant}"

        edges: list[tuple[str, str, str, str]] = []
        for (n, v), s in self._sources.items():
            for (inn, inv) in s.inputs:
                edges.append(("source", k(inn, inv), "source", k(n, v)))
        for (n, v), f in self._features.items():
            edges.append(("source", k(*f.source), "feature", k(n, v)))
        for (n, v), lb in self._labels.items():
            edges.append(("source", k(*lb.source), "label", k(n, v)))
        for (n, v), ts in self._training_sets.items():
            edges.append(("label", k(*ts.label), "training_set", k(n, v)))
            for fk in ts.features:
                edges.append(("feature", k(*fk), "training_set", k(n, v)))
            for lag in ts.lags:
                edges.append(
                    ("feature", k(lag.feature, lag.variant),
                     "training_set", k(n, v))
                )
        for name, m in self._models.items():
            for fk in m.features:
                edges.append(("feature", k(*fk), "model", name))
            for tk in m.training_sets:
                edges.append(("training_set", k(*tk), "model", name))
        # stable, de-duplicated (lag of an also-plain feature repeats)
        return sorted(set(edges))

    def upstream_closure(
        self, kind: str, name: str, variant: str | None = None
    ) -> set[tuple[str, str]]:
        """Transitive upstream set of a resource — everything whose
        change invalidates it (the impact-analysis walk). Returns
        ``(type, key)`` pairs, excluding the resource itself."""
        key = name if variant is None else f"{name}.{variant}"
        by_dst: dict[tuple[str, str], list[tuple[str, str]]] = {}
        for ut, uk, dt, dk in self.lineage_edges():
            by_dst.setdefault((dt, dk), []).append((ut, uk))
        seen: set[tuple[str, str]] = set()
        frontier = [(kind, key)]
        while frontier:
            node = frontier.pop()
            for up in by_dst.get(node, []):
                if up not in seen:
                    seen.add(up)
                    frontier.append(up)
        return seen

    def apply(self) -> dict[str, int]:
        """Entry point A (SURVEY §3.1): resolve EVERY registered
        resource in dependency order — the in-process collapse of
        client.apply → metadata server → coordinator task DAG
        (coordinator/scheduler.go:52-79).

        Evaluation is analysis-eager, action-lazy: each resource's
        DataFrame is built (so missing sources, bad references, and
        schema errors surface here, like the coordinator failing a
        task) but no Spark job runs until something is served or
        written. Returns resource counts by type.
        """
        for key in list(self._sources):
            self.dataframe(*key)
        for key in list(self._features):
            self.feature_table(*key)
        for key in list(self._labels):
            self.label_table(*key)
        for key in list(self._training_sets):
            self.training_set_dataframe(*key)
        return {
            "sources": len(self._sources),
            "features": len(self._features),
            "labels": len(self._labels),
            "training_sets": len(self._training_sets),
            "on_demand": len(self._on_demand),
        }

    def create_transformation_table(
        self,
        name: str,
        variant: str,
        table_name: str | None = None,
        fmt: str = "parquet",
        path: str | None = None,
        replace: bool = False,
    ) -> str:
        """C17: persist a transformation as a catalog table — the
        reference's ``CREATE TABLE t AS SELECT * FROM (<user query>)``
        (provider/sql.go:1941-1945). The table is also registered back
        as a primary source ``(table_name, variant)`` so downstream
        transformations/features can read the materialized table
        instead of recomputing the query (materialization reuse,
        provider/spark.go:275-292).
        """
        from embeddinghub_spark.sources.tables import (
            create_or_replace_table,
            create_table_as,
        )

        df = self.dataframe(name, variant)
        table_name = table_name or f"{name}__{variant}"
        if replace:
            create_or_replace_table(df, table_name, fmt=fmt, path=path)
        else:
            create_table_as(df, table_name, fmt=fmt, path=path)
        self.register_source(
            SourceVariant(name=table_name, variant=variant, table=table_name)
        )
        return table_name


# -- manifest persistence -----------------------------------------------------
#
# The reference persists its resource graph in a metadata server
# (etcd/sqlite behind gRPC — metadata/metadata.go:56-71); the
# single-process equivalent is a JSON manifest. Everything declarative
# round-trips: files/tables, SQL transformations, column mappings,
# entity mappings, lags, training sets. Python CALLABLES do not
# (DFTransformations `fn`, on-demand fns): the reference ships those
# as pickled bytes, which is a code-execution trust decision we make
# explicit — `save_manifest` records their names; `load_manifest`
# accepts a `functions={name__variant: fn}` registry to rebind them.

_MANIFEST_VERSION = 1


def save_manifest(catalog: Catalog, path: str) -> str:
    """Serialize the catalog's declarative state to a JSON manifest."""
    import json

    def src(s: SourceVariant) -> dict:
        return {
            "name": s.name, "variant": s.variant, "path": s.path,
            "fmt": s.fmt, "table": s.table, "query": s.query,
            "fn": None if s.fn is None else getattr(s.fn, "__name__", "<fn>"),
            "inputs": [list(i) for i in s.inputs],
            "timestamp_column": s.timestamp_column,
            "options": [list(o) for o in s.options],
        }

    doc = {
        "version": _MANIFEST_VERSION,
        "entities": [
            {"name": e.name, "description": e.description}
            for e in catalog._entities.values()
        ],
        "sources": [src(s) for s in catalog._sources.values()],
        "features": [
            {
                "name": f.name, "variant": f.variant, "source": list(f.source),
                "columns": {"entity": f.columns.entity, "value": f.columns.value,
                            "ts": f.columns.ts},
                "entity": f.entity,
            }
            for f in catalog._features.values()
        ],
        "labels": [
            {
                "name": l.name, "variant": l.variant, "source": list(l.source),
                "columns": {"entity": l.columns.entity, "value": l.columns.value,
                            "ts": l.columns.ts},
                "entity": l.entity,
                "entity_mappings": [
                    {"name": m.name, "entity_column": m.entity_column}
                    for m in l.entity_mappings
                ],
            }
            for l in catalog._labels.values()
        ],
        "training_sets": [
            {
                "name": t.name, "variant": t.variant, "label": list(t.label),
                "features": [list(f) for f in t.features],
                "lags": [
                    {"feature": lg.feature, "variant": lg.variant,
                     "lag_seconds": lg.lag.total_seconds(), "alias": lg.alias}
                    for lg in t.lags
                ],
            }
            for t in catalog._training_sets.values()
        ],
        "users": sorted(catalog._users),
        "providers": [
            {"name": p.name, "provider_type": p.provider_type,
             "description": p.description}
            for p in catalog._providers.values()
        ],
        "models": [
            {"name": m.name, "description": m.description,
             "features": [list(f) for f in m.features],
             "training_sets": [list(t) for t in m.training_sets]}
            for m in catalog._models.values()
        ],
        "on_demand": sorted(
            f"{n}__{v}" for (n, v) in catalog._on_demand
        ),
        "df_transformations": sorted(
            f"{s.name}__{s.variant}"
            for s in catalog._sources.values()
            if s.fn is not None
        ),
    }
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    return path


def load_manifest(
    spark: SparkSession,
    path: str,
    functions: dict[str, Callable] | None = None,
) -> Catalog:
    """Rebuild a Catalog from a manifest. Declarative resources load
    directly; DF transformations and on-demand features rebind from
    ``functions`` (key ``name__variant``) — absent entries are skipped
    with their names preserved in the raised-on-use error path."""
    import json

    with open(path) as fh:
        doc = json.load(fh)
    if doc.get("version") != _MANIFEST_VERSION:
        raise ValueError(f"unsupported manifest version {doc.get('version')}")
    functions = functions or {}
    cat = Catalog(spark)
    for e in doc["entities"]:
        cat.register_entity(e["name"], e["description"])
    for s in doc["sources"]:
        key = f"{s['name']}__{s['variant']}"
        fn = functions.get(key)
        if s["fn"] is not None and fn is None:
            continue  # unbound DF transformation: skip, not guess
        cat.register_source(
            SourceVariant(
                name=s["name"], variant=s["variant"], path=s["path"],
                fmt=s["fmt"], table=s["table"], query=s["query"], fn=fn,
                inputs=tuple(tuple(i) for i in s["inputs"]),
                timestamp_column=s["timestamp_column"],
                options=tuple(tuple(o) for o in s["options"]),
            )
        )
    for f in doc["features"]:
        cat.register_feature(
            f["name"], f["variant"], tuple(f["source"]),
            f["columns"]["entity"], f["columns"]["value"], f["columns"]["ts"],
            entity=f["entity"],
        )
    for l in doc["labels"]:
        cat.register_label(
            l["name"], l["variant"], tuple(l["source"]),
            l["columns"]["entity"], l["columns"]["value"], l["columns"]["ts"],
            entity=l["entity"],
            entity_mappings=[
                EntityMapping(m["name"], m["entity_column"])
                for m in l["entity_mappings"]
            ] or None,
        )
    for t in doc["training_sets"]:
        cat.register_training_set(
            t["name"], t["variant"], tuple(t["label"]),
            [tuple(f) for f in t["features"]],
            lags=[
                FeatureLag(
                    lg["feature"], lg["variant"],
                    timedelta(seconds=lg["lag_seconds"]), lg["alias"],
                )
                for lg in t["lags"]
            ] or None,
        )
    for key in doc["on_demand"]:
        fn = functions.get(key)
        if fn is None:
            continue
        name, variant = key.rsplit("__", 1)
        cat.register_on_demand(name, variant, fn=fn)
    # metadata-only resources (absent in pre-r4 manifests: .get)
    for u in doc.get("users", []):
        cat.register_user(u)
    for p in doc.get("providers", []):
        cat.register_provider(p["name"], p["provider_type"], p["description"])
    for mdl in doc.get("models", []):
        cat.register_model(
            mdl["name"], mdl["description"],
            features=[tuple(f) for f in mdl["features"]],
            training_sets=[tuple(t) for t in mdl["training_sets"]],
        )
    return cat
