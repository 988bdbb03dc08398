"""Property graph schema: label-combination -> property types, rel type ->
property types.

Re-expresses the reference's PropertyGraphSchema
(okapi-api/src/main/scala/org/opencypher/okapi/api/schema/PropertyGraphSchema.scala:62-364):
``label_property_map`` (:90), ``relationship_keys`` (:85), schema union ``++``
(:319). Inference from DataFrames replaces the reference's explicit schema
declaration for the common case.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, FrozenSet, Iterable, Set

from cypher_for_apache_spark_spark.types import CypherType, from_spark_type


LabelCombo = FrozenSet[str]


@dataclass
class PropertyGraphSchema:
    # label combination -> {property key -> CypherType}
    label_property_map: Dict[LabelCombo, Dict[str, CypherType]] = field(default_factory=dict)
    # relationship type -> {property key -> CypherType}
    relationship_keys: Dict[str, Dict[str, CypherType]] = field(default_factory=dict)
    # relationship type -> set of (source label combo, target label combo)
    rel_endpoints: Dict[str, Set[tuple]] = field(default_factory=dict)

    # -- declaration ------------------------------------------------------
    def with_node(self, labels: Iterable[str], props: Dict[str, CypherType]) -> "PropertyGraphSchema":
        combo = frozenset(labels)
        if combo in self.label_property_map:
            merged = dict(self.label_property_map[combo])
            keys = set(merged) | set(props)
            for k in keys:
                if k in merged and k in props:
                    merged[k] = merged[k].join(props[k])
                else:
                    merged[k] = (merged.get(k) or props[k]).with_nullable(True)
            self.label_property_map[combo] = merged
        else:
            self.label_property_map[combo] = dict(props)
        return self

    def with_relationship(self, rel_type: str, props: Dict[str, CypherType]) -> "PropertyGraphSchema":
        if rel_type in self.relationship_keys:
            merged = dict(self.relationship_keys[rel_type])
            keys = set(merged) | set(props)
            for k in keys:
                if k in merged and k in props:
                    merged[k] = merged[k].join(props[k])
                else:
                    merged[k] = (merged.get(k) or props[k]).with_nullable(True)
            self.relationship_keys[rel_type] = merged
        else:
            self.relationship_keys[rel_type] = dict(props)
        return self

    # -- queries ----------------------------------------------------------
    @property
    def labels(self) -> Set[str]:
        out: Set[str] = set()
        for combo in self.label_property_map:
            out |= combo
        return out

    @property
    def relationship_types(self) -> Set[str]:
        return set(self.relationship_keys)

    def label_combinations(self, labels: Iterable[str] = ()) -> Set[LabelCombo]:
        """All stored combos containing every label in ``labels``."""
        want = set(labels)
        return {c for c in self.label_property_map if want <= c}

    def node_property_keys(self, labels: Iterable[str] = ()) -> Dict[str, CypherType]:
        """Merged property keys over all combos matching ``labels``
        (reference: nodePropertyKeys, PropertyGraphSchema.scala:144)."""
        combos = self.label_combinations(labels)
        out: Dict[str, CypherType] = {}
        for c in combos:
            for k, v in self.label_property_map[c].items():
                out[k] = out[k].join(v) if k in out else v
        # keys absent from some combos become nullable
        for c in combos:
            for k in out:
                if k not in self.label_property_map[c]:
                    out[k] = out[k].with_nullable(True)
        return out

    def relationship_property_keys(self, rel_types: Iterable[str] = ()) -> Dict[str, CypherType]:
        types = set(rel_types) or set(self.relationship_keys)
        out: Dict[str, CypherType] = {}
        for t in types:
            for k, v in self.relationship_keys.get(t, {}).items():
                out[k] = out[k].join(v) if k in out else v
        for t in types:
            for k in out:
                if k not in self.relationship_keys.get(t, {}):
                    out[k] = out[k].with_nullable(True)
        return out

    # -- union (reference: ++, PropertyGraphSchema.scala:319) -------------
    def union(self, other: "PropertyGraphSchema") -> "PropertyGraphSchema":
        out = PropertyGraphSchema()
        for combo, props in self.label_property_map.items():
            out.with_node(combo, props)
        for combo, props in other.label_property_map.items():
            out.with_node(combo, props)
        for t, props in self.relationship_keys.items():
            out.with_relationship(t, props)
        for t, props in other.relationship_keys.items():
            out.with_relationship(t, props)
        for src in (self.rel_endpoints, other.rel_endpoints):
            for t, eps in src.items():
                out.rel_endpoints.setdefault(t, set()).update(eps)
        return out

    # -- inference ---------------------------------------------------------
    @staticmethod
    def props_from_df(df, exclude: Iterable[str]) -> Dict[str, CypherType]:
        ex = set(exclude)
        return {
            f.name: from_spark_type(f.dataType, f.nullable)
            for f in df.schema.fields
            if f.name not in ex
        }
