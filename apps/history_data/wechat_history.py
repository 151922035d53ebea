"""WeChat chat-history reader.

Parity with the reference WeChat pipeline (apps/history_data/
wechat_history.py:14-774): consumes JSON exports produced by a
WeChatTweak-style exporter (one file per contact, messages with sender/time/
content), concatenates consecutive messages into conversation windows, and
cleans markup. The actual export step requires a jailbroken macOS WeChat
client (see the reference's packages/wechat-exporter); here we read any
directory of exported JSON files with the shape::

    [{"contact": str, "messages": [{"from": str, "time": str, "text": str}]}]
    or a flat [{"from", "time", "text"}] list per file.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional

_CLEAN_RE = re.compile(r"<[^>]+>|\[[^\]]{1,16}\]")  # xml-ish markup + emoticon tags


def clean_message(text: str) -> str:
    return _CLEAN_RE.sub(" ", text or "").strip()


def _iter_message_groups(payload: Any, fallback_contact: str):
    if isinstance(payload, dict):
        payload = [payload]
    if isinstance(payload, list) and payload and isinstance(payload[0], dict) and "messages" in payload[0]:
        for grp in payload:
            yield grp.get("contact", fallback_contact), grp.get("messages", [])
    else:
        yield fallback_contact, payload if isinstance(payload, list) else []


def load_wechat_export(
    export_dir: str, window: int = 20, max_count: int = -1
) -> List[Dict[str, Any]]:
    """-> [{"text", "metadata": {"contact", "start_time"}}] conversation
    windows of up to ``window`` consecutive messages."""
    out: List[Dict[str, Any]] = []
    if not os.path.isdir(export_dir):
        return out
    for fn in sorted(os.listdir(export_dir)):
        if not fn.endswith(".json"):
            continue
        path = os.path.join(export_dir, fn)
        try:
            with open(path, encoding="utf-8") as f:
                payload = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        contact_default = os.path.splitext(fn)[0]
        for contact, messages in _iter_message_groups(payload, contact_default):
            buf: List[str] = []
            start_time: Optional[str] = None
            for m in messages:
                if not isinstance(m, dict):
                    continue
                text = clean_message(m.get("text") or m.get("content") or "")
                if not text:
                    continue
                if start_time is None:
                    start_time = str(m.get("time", ""))
                buf.append(f"{m.get('from', m.get('sender', '?'))}: {text}")
                if len(buf) >= window:
                    out.append({"text": "\n".join(buf),
                                "metadata": {"contact": contact, "start_time": start_time}})
                    buf, start_time = [], None
                    if 0 < max_count <= len(out):
                        return out
            if buf:
                out.append({"text": "\n".join(buf),
                            "metadata": {"contact": contact, "start_time": start_time or ""}})
    return out
