"""Octopus orchestration state machine (OctopusInterface.scala:219-311)."""

from __future__ import annotations

import pytest

from serene_spark.modeler.orchestrate import Octopus, Status


def test_train_predict_lifecycle(spark, sf_dir):
    oct_ = Octopus(spark, sf_dir)
    assert oct_.state.status == Status.UNTRAINED
    with pytest.raises(RuntimeError):
        oct_.predict()

    state = oct_.train()
    assert state.status == Status.BUSY
    # second launch while busy is a no-op returning the BUSY state
    assert oct_.train().status == Status.BUSY

    final = oct_.wait(timeout=600)
    assert final.status == Status.COMPLETE
    assert oct_.lobster_state.status == Status.COMPLETE
    assert oct_.alignment is not None and oct_.model is not None

    # already-trained + no force → immediate COMPLETE, no relaunch
    assert oct_.train().status == Status.COMPLETE

    suggestions = oct_.predict()
    assert suggestions, "expected at least one suggested SSD"
    ssd, scores = suggestions[0]
    assert ssd.triples() and scores.karma_rank == 1


def test_error_state_on_bad_input(spark, tmp_path):
    oct_ = Octopus(spark, str(tmp_path / "nonexistent"))
    oct_.train()
    final = oct_.wait(timeout=600)
    assert final.status == Status.ERROR
    assert oct_.lobster_state.status == Status.ERROR
    assert "MatcherError" in final.message
    with pytest.raises(RuntimeError):
        oct_.predict()
