"""CLI flag parity: every reference experiment invocation parses unchanged.

Extracts the argument vector of each reference shell script
(scripts/vit-sr-nas/**/*.sh, after the ``main.py`` / ``evo_search.py``
entry) and feeds it to this framework's parsers — any renamed/missing flag
fails.  Runs only where the reference checkout is mounted.
"""

import glob
import os
import shlex

import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "scripts")),
    reason="reference checkout not available")

# flags consumed by torch.distributed.launch, not the program
_LAUNCHER_FLAGS = {"--nproc_per_node", "--use_env", "--nnodes", "--node_rank",
                   "--master_addr", "--master_port"}


def _extract_argv(path):
    with open(path) as f:
        text = f.read()
    # join line continuations, drop comments/shell noise
    text = text.replace("\\\n", " ")
    for line in text.splitlines():
        line = line.strip()
        if "kill " in line or "grep" in line:
            continue
        if "main.py" in line or "evo_search.py" in line:
            tokens = shlex.split(line)
            entry = next(i for i, t in enumerate(tokens)
                         if t.endswith(("main.py", "evo_search.py")))
            is_search = tokens[entry].endswith("evo_search.py")
            argv = []
            skip_next = False
            for tok in tokens[entry + 1:]:
                if skip_next:
                    skip_next = False
                    continue
                if tok.split("=")[0] in _LAUNCHER_FLAGS:
                    skip_next = "=" not in tok
                    continue
                # shell variables -> dummy values
                if tok.startswith("$"):
                    tok = "/tmp/placeholder"
                argv.append(tok)
            return is_search, argv
    raise AssertionError(f"no entry line found in {path}")


@pytest.mark.parametrize("script", sorted(
    glob.glob(os.path.join(REFERENCE, "scripts", "**", "*.sh"), recursive=True)),
    ids=lambda p: os.path.relpath(p, REFERENCE))
def test_reference_script_flags_parse(script):
    from vit_search_tpu.cli.evo_search import get_args_parser as search_parser
    from vit_search_tpu.cli.train import get_args_parser as train_parser

    is_search, argv = _extract_argv(script)
    if "--network-def" in argv and argv[argv.index("--network-def") + 1].startswith("--"):
        pytest.skip("upstream script ships a dangling --network-def (no value)")
    parser = search_parser() if is_search else train_parser()
    args, unknown = parser.parse_known_args(argv)
    assert not unknown, f"{os.path.basename(script)}: unknown flags {unknown}"

    if not is_search:
        # the model name must resolve in our registry
        from vit_search_tpu.models import available_models
        assert args.model in available_models(), args.model
    if getattr(args, "search_space", None):
        from vit_search_tpu.arch import available_spaces
        assert args.search_space in available_spaces(), args.search_space
    if getattr(args, "network_def", None):
        from vit_search_tpu.arch import parse_network_def, validate
        validate(parse_network_def(args.network_def))
