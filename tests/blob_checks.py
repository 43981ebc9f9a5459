"""Python-3 port of the reference's ws-tests response-shape combinators
(ws-tests/check.py:106-237): field/opt_field/check_blob/check_list/
check_dict plus the domain blobs (taxon, node, source map, arguson).
Failures collect messages instead of printing, so pytest can assert.
"""

from __future__ import annotations

import re

ERRORS: list[str] = []


def _err(msg: str) -> bool:
    ERRORS.append(msg)
    return False


def reset_errors() -> None:
    ERRORS.clear()


def check_integer(x, where=""):
    return True if isinstance(x, int) and not isinstance(x, bool) else _err(f"expected int, got {x!r} {where}")


def check_float_or_int(x, where=""):
    return True if isinstance(x, (int, float)) else _err(f"expected number, got {x!r} {where}")


def check_string(x, where=""):
    return True if isinstance(x, str) else _err(f"expected string, got {x!r} {where}")


def check_boolean(x, where=""):
    return True if isinstance(x, bool) else _err(f"expected bool, got {x!r} {where}")


def check_unique_name(x, where=""):
    # ws-tests/check.py:96-107 — non-empty string
    if not isinstance(x, str):
        return _err(f"expected string unique_name, got {x!r} {where}")
    if len(x) == 0:
        return _err(f"expected non-empty unique_name {where}")
    return True


def check_source_id(x, where=""):
    # 'pg_2044@tree4212', 'ot_157@tree1', or taxonomy id 'ott2.9draft12'
    if not isinstance(x, str):
        return _err(f"expected source id string, got {x!r} {where}")
    if not re.match(r"^([A-Za-z0-9_]+@[A-Za-z0-9_]+|ott.+)$", x):
        return _err(f"malformed source id {x!r} {where}")
    return True


def field(name, check):
    return (name, check, True)


def opt_field(name, check):
    return (name, check, False)


def more_where(w, where):
    return where if where == "" else f"{w} in {where}"


def check_blob(fields):
    required = [name for (name, _c, req) in fields if req]
    checks = {name: c for (name, c, _req) in fields}

    def do_check_blob(x, where=""):
        if not isinstance(x, dict):
            return _err(f"expected dict, got {x!r} {where}")
        win = True
        for name in x:
            if name in checks:
                if not checks[name](x[name], more_where(name, where)):
                    win = False
            else:
                win = _err(f"unexpected field {name!r} among {sorted(x)} {where}")
        for name in required:
            if name not in x:
                win = _err(f"missing required field {name!r} among {sorted(x)} {where}")
        return win

    return do_check_blob


def check_list(check):
    def do_check_list(x, where=""):
        if not isinstance(x, list):
            return _err(f"expected list, got {x!r} {where}")
        return all(check(y, more_where("list", where)) for y in x)

    return do_check_list


def check_dict(check_key, check_val):
    def do_check_dict(x, where=""):
        if not isinstance(x, dict):
            return _err(f"expected dict, got {x!r} {where}")
        ok = True
        for key in x:
            if not check_key(key, where):
                ok = False
            if not check_val(x[key], f" in {key}{where}"):
                ok = False
        return ok

    return do_check_dict


# domain blobs (ws-tests/check.py:175-237) -----------------------------------

taxon_blob_fields = [
    field("ott_id", check_integer),
    field("name", check_string),
    field("rank", check_string),
    field("unique_name", check_unique_name),
    field("tax_sources", check_list(check_string)),
]
check_taxon_blob = check_blob(taxon_blob_fields)

check_single_support_blob = check_dict(check_source_id, check_string)
check_multi_support_blob = check_dict(check_source_id, check_list(check_string))

node_blob_fields = [
    field("node_id", check_string),
    opt_field("taxon", check_taxon_blob),
    field("num_tips", check_integer),
    opt_field("supported_by", check_single_support_blob),
    opt_field("resolves", check_single_support_blob),
    opt_field("resolved_by", check_multi_support_blob),
    opt_field("conflicts_with", check_multi_support_blob),
    opt_field("partial_path_of", check_single_support_blob),
    opt_field("terminal", check_single_support_blob),
    opt_field("was_constrained", check_boolean),
    opt_field("was_uncontested", check_boolean),
]
check_node_blob = check_blob(node_blob_fields)

check_source_tree_blob = check_blob(
    [field("git_sha", check_string), field("tree_id", check_string), field("study_id", check_string)]
)
check_taxonomy_blob = check_blob(
    [field("taxonomy", check_string), opt_field("version", check_string), opt_field("name", check_string)]
)


def check_source_blob(x, where=""):
    if isinstance(x, dict) and "tree_id" in x:
        return check_source_tree_blob(x, where)
    return check_taxonomy_blob(x, where)


check_source_id_map = check_dict(check_source_id, check_source_blob)


def check_arguson_blob(x, where=""):
    return _really_check_arguson_blob(x, where)


lineage_blob_fields = node_blob_fields + [
    opt_field("descendant_name_list", check_list(check_string))
]
check_lineage_blob = check_blob(lineage_blob_fields)

arguson_blob_fields = lineage_blob_fields + [
    opt_field("children", check_list(check_arguson_blob))
]
_really_check_arguson_blob = check_blob(arguson_blob_fields)

check_top_arguson_blob = check_blob(
    arguson_blob_fields
    + [field("source_id_map", check_source_id_map), field("lineage", check_list(check_lineage_blob))]
)
