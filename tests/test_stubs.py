"""Public stub consistency (VERDICT r2 #8).

The environment ships no mypy, so this test is the local stand-in for the
CI typecheck job: the root stub (``__init__.pyi``) must export exactly the
runtime ``__all__``, and every stubbed class must expose the methods the
runtime object exposes (name-level drift detection; signature strictness
is CI's mypy --strict job).
"""

import ast
import inspect

import needletail_tpu as nt


def _stub_tree():
    return ast.parse(open("needletail_tpu/__init__.pyi").read())


def test_stub_exports_match_runtime_all():
    tree = _stub_tree()
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            names.add(node.name)
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
    stub_all = None
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and getattr(node.targets[0], "id", "") == "__all__"
        ):
            stub_all = {ast.literal_eval(e) for e in node.value.elts}
    assert stub_all == set(nt.__all__)
    missing = [n for n in nt.__all__ if n not in names]
    assert not missing, f"stub missing definitions for {missing}"


def test_stub_methods_exist_at_runtime():
    tree = _stub_tree()
    for node in tree.body:
        if not isinstance(node, ast.ClassDef):
            continue
        runtime = getattr(nt, node.name)
        for item in node.body:
            if isinstance(item, ast.FunctionDef):
                assert hasattr(runtime, item.name), (node.name, item.name)


def test_stub_function_parameters_match_runtime():
    tree = _stub_tree()
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef):
            continue
        runtime = getattr(nt, node.name)
        stub_params = [a.arg for a in node.args.args]
        run_params = list(inspect.signature(runtime).parameters)
        assert stub_params == run_params, (node.name, stub_params, run_params)
