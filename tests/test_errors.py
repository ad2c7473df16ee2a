"""Typed exceptions + process wrapper (reference common::Exceptions /
common::run, include/common/Exceptions.hh, Program.hh)."""

from isaac_aligner_tpu.cli import main as cli_main
from isaac_aligner_tpu.utils.errors import (InvalidOptionError, IoError,
                                            IsaacError, MemoryError_,
                                            PreConditionError, run)


def test_exit_codes():
    assert run(lambda a: (_ for _ in ()).throw(IoError("boom"))) == 2
    assert run(lambda a: (_ for _ in ()).throw(
        InvalidOptionError("bad flag"))) == 3
    assert run(lambda a: (_ for _ in ()).throw(
        PreConditionError("contract"))) == 4
    assert run(lambda a: (_ for _ in ()).throw(MemoryError_("oom"))) == 5
    assert run(lambda a: 0) == 0


def test_hierarchy():
    for cls in (IoError, InvalidOptionError, PreConditionError, MemoryError_):
        assert issubclass(cls, IsaacError)


def test_untyped_host_errors_map_to_io(capsys):
    assert run(lambda a: (_ for _ in ()).throw(
        FileNotFoundError("nope.fa"))) == 2
    assert "nope.fa" in capsys.readouterr().err


def test_cli_missing_input_is_clean(tmp_path, capsys):
    rc = run(cli_main, ["sort-reference", "-g", str(tmp_path / "none.fa"),
                        "-o", str(tmp_path / "out")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "none.fa" in err and "Traceback" not in err
