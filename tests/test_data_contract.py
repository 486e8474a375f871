"""Machine-checked conformance of our bronze boxscore schema against the
reference's data contract (`docs/data_contracts/nhl_api/boxscore.yml`).

Direction of the check: every field OUR schema declares must be either
documented in the contract (with a compatible type) or demonstrably read
by the reference's own dbt SQL (the contract has documented gaps — e.g.
`homeTeam.name`, which `stg_games.sql:18,21` reads but the YAML omits).
Our schema deliberately declares a SUBSET of the contract (schema
pruning is how Spark reads less), so contract fields we don't consume
are fine; fields we invent are not.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from nhl_data_pipeline_spark.nhl import schemas

CONTRACT = Path(
    "/root/reference/docs/data_contracts/nhl_api/boxscore.yml"
)

# Contract gaps: paths the reference's own models read but the YAML does
# not document. Each entry cites the reference SQL that proves the field
# exists in the real payload.
DOCUMENTED_GAPS = {
    ("homeTeam", "name"),  # stg_games.sql:18  homeTeam.name.default
    ("awayTeam", "name"),  # stg_games.sql:21  awayTeam.name.default
}
# Same class of gap for fields of the player-stats ARRAYS (they appear
# under every team/position array, so they are keyed by leaf name but
# only honored INSIDE an array — see the "[]" check below): read by the
# reference at the cited line, absent from the YAML.
DOCUMENTED_GAP_ARRAY_LEAVES = {
    "shorthandedGoals",  # stg_player_game_stats.sql:75  value:shorthandedGoals
}

# contract scalar type -> acceptable Spark typeName()s
COMPAT = {
    "int": {"long", "integer"},
    "string": {"string"},
    "float": {"double", "float"},
    "bool": {"boolean"},
}


def _load_contract():
    yaml = pytest.importorskip("yaml")
    if not CONTRACT.exists():
        pytest.skip("reference tree not present")
    doc = yaml.safe_load(CONTRACT.read_text())
    nested = doc.get("nested_types", {})

    def resolve(spec, siblings):
        # `see: otherField` aliases a sibling definition verbatim
        if "see" in spec and "fields" not in spec:
            return siblings[spec["see"]]
        return spec

    return doc["fields"], nested, resolve


def _walk(struct, contract_fields, nested, resolve, path=()):
    """Yield (path, spark_type, contract_spec_or_None) for every field
    of our StructType."""
    for f in struct.fields:
        spec = contract_fields.get(f.name)
        if spec is not None:
            spec = resolve(spec, contract_fields)
        yield (path + (f.name,), f.dataType, spec)
        if spec is None:
            continue
        dt = f.dataType
        if dt.typeName() == "struct":
            yield from _walk(
                dt, spec.get("fields", {}), nested, resolve,
                path + (f.name,),
            )
        elif dt.typeName() == "array":
            items = spec.get("items")
            el = dt.elementType
            if items and el.typeName() == "struct":
                item_spec = nested.get(items, {})
                yield from _walk(
                    el, item_spec.get("fields", {}), nested, resolve,
                    path + (f.name, "[]"),
                )


def test_boxscore_schema_conforms_to_reference_contract():
    contract_fields, nested, resolve = _load_contract()
    problems = []
    for path, dt, spec in _walk(
        schemas.boxscore_payload(), contract_fields, nested, resolve
    ):
        bare = tuple(p for p in path if p != "[]")
        if spec is None:
            # (children of a gap field are never reached: _walk does not
            # recurse into spec-less fields, so exact-match is enough)
            if bare in DOCUMENTED_GAPS or (
                "[]" in path and bare[-1] in DOCUMENTED_GAP_ARRAY_LEAVES
            ):
                continue
            problems.append(f"{'.'.join(path)}: not in contract")
            continue
        ctype = spec.get("type")
        tname = dt.typeName()
        if ctype in COMPAT and tname not in COMPAT[ctype]:
            problems.append(
                f"{'.'.join(path)}: contract {ctype} vs spark {tname}"
            )
        elif ctype == "object" and tname != "struct":
            problems.append(f"{'.'.join(path)}: object vs {tname}")
        elif ctype == "array" and tname != "array":
            problems.append(f"{'.'.join(path)}: array vs {tname}")
    assert not problems, problems


def test_contract_fields_our_models_consume_are_typed_compatibly():
    """The specific paths our staging models read (stg_games /
    stg_player_game_stats analogs) resolve in the contract with the
    types the models assume."""
    contract_fields, nested, resolve = _load_contract()
    team = resolve(contract_fields["homeTeam"], contract_fields)
    assert "abbrev" in team["fields"]
    assert team["fields"]["score"]["type"] == "int"
    pbs = contract_fields["playerByGameStats"]["fields"]
    home = resolve(pbs["homeTeam"], pbs)
    assert home["fields"]["forwards"]["items"] == "PlayerStats"
    ps = nested["PlayerStats"]["fields"]
    assert ps["playerId"]["type"] == "int"
    # the stats our fact models aggregate
    for stat in ("goals", "assists", "points"):
        assert stat in ps, stat
