"""Frontend <-> backend contract tests.

There is no browser/node in the test image, so the frontend can't be executed
— but its *contract* with the serving stack is machine-checkable: the WS
message types it sends must all be handled by the server, the reply types it
dispatches on must be the ones the server emits, the HTTP endpoints it calls
must be routed, and the DOM ids it queries must exist in index.html.
This catches protocol drift between `frontend/app.js` (the rewrite of the
reference's `frontend/app.js:49-344`) and `serving/http.py` /
`serving/server_*.py` without a browser.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
APP_JS = (REPO / "frontend" / "app.js").read_text()
INDEX_HTML = (REPO / "frontend" / "index.html").read_text()


def test_ws_message_types_sent_are_handled():
    """Every `{type: "X"}` the frontend sends has a server handler branch."""
    sent = set(re.findall(r'type:\s*"([a-z_]+)"', APP_JS))
    assert sent == {"start", "frame", "audio", "stop"}, sent

    http_py = (
        REPO / "multimodalemotionrecognition_tpu" / "serving" / "http.py"
    ).read_text()
    handled = set(re.findall(r'msg_type == "([a-z_]+)"', http_py))
    missing = sent - handled
    assert not missing, f"frontend sends unhandled WS message types: {missing}"


def test_ws_reply_types_dispatched_are_emitted():
    """The reply types the frontend switches on are emitted by the server."""
    dispatched = set(re.findall(r'msg\.type === "([a-z_]+)"', APP_JS))
    assert dispatched, "frontend no longer dispatches on msg.type?"

    http_py = (
        REPO / "multimodalemotionrecognition_tpu" / "serving" / "http.py"
    ).read_text()
    emitted = set(re.findall(r'\{"type": "([a-z_]+)"', http_py))
    missing = dispatched - emitted
    assert not missing, f"frontend expects reply types never emitted: {missing}"


def test_frame_and_audio_payload_fields_match():
    """Field names inside frame/audio messages match what the server reads."""
    http_py = (
        REPO / "multimodalemotionrecognition_tpu" / "serving" / "http.py"
    ).read_text()
    for field in ("image_b64", "pcm_b64", "sample_rate"):
        assert re.search(rf"\b{field}\b", APP_JS), f"frontend lost {field}"
        assert re.search(rf"\b{field}\b", http_py), f"server lost {field}"


def test_http_endpoints_called_are_routed():
    """POST /predict and WS /ws/stream exist on both serving apps."""
    assert "/predict" in APP_JS and "/ws/stream" in APP_JS

    from multimodalemotionrecognition_tpu.config import ServeConfig
    from multimodalemotionrecognition_tpu.serving.server_direct import (
        create_app as direct_app,
    )
    from multimodalemotionrecognition_tpu.serving.server_queued import (
        create_app as queued_app,
    )

    for app in (direct_app(mock=True), queued_app(config=ServeConfig(), mock=True)):
        paths = {r.resource.canonical for r in app.router.routes() if r.resource}
        assert "/predict" in paths, sorted(paths)
        assert "/ws/stream" in paths, sorted(paths)


def test_dom_ids_exist_in_index_html():
    """Every getElementById target is present in index.html."""
    ids = set(re.findall(r'getElementById\("([\w-]+)"\)', APP_JS))
    assert ids, "frontend no longer queries any DOM ids?"
    declared = set(re.findall(r'id="([\w-]+)"', INDEX_HTML))
    missing = ids - declared
    assert not missing, f"app.js queries ids missing from index.html: {missing}"


def test_prediction_rendering_handles_both_prob_scales():
    """The frontend normalizes worker 0..1 probs vs direct-backend percent
    (the reference's deliberate scale mismatch, SURVEY.md §2 #39) — keep the
    normalization present."""
    assert re.search(r"total > 1\.5", APP_JS), (
        "frontend dropped the 0..1-vs-percent probability normalization"
    )
