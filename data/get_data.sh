#!/usr/bin/env bash
# Fetch the six benchmark datasets into data/ from the public archives the
# reference documents (URLs per /root/reference/get_data.sh). Requires
# network access — the development container for this repo has none; use the
# synthetic generators in rgcn_tpu/data/synthetic.py there.
set -euo pipefail
cd "$(dirname "$0")"

fetch() {
  local name="$1" url="$2"
  echo "== ${name}"
  wget -q -O "${name}.zip" "${url}"
  mkdir -p "${name}"
  unzip -o -q "${name}.zip" -d "${name}"
  rm -f "${name}.zip"
}

# Node classification (RDF graphs + train/test TSVs)
fetch aifb  "https://www.dropbox.com/sh/ldjd70yvnu9akxi/AAAam7SBr5KXLfjk-NVGQNWRa?dl=1"
fetch am    "https://www.dropbox.com/sh/5ys1lfw9c8padz0/AABEJChkUHkxrWfvXrgehOX5a?dl=1"
fetch bgs   "https://www.dropbox.com/sh/so1n0zc4zkel2mf/AACq3llckg1AAMfi2umI3MbGa?dl=1"
fetch mutag "https://www.dropbox.com/sh/tburaaxij0a1vmy/AAAlD5ORzcMbF3YpoynOLGqwa?dl=1"

# Link prediction (triple stores)
fetch fb-toy "https://www.dropbox.com/sh/5kv7xk4cj1md9zw/AADpaREEK9K5NX_Vb5eRcXuRa?dl=1"
fetch wn18   "https://www.dropbox.com/sh/egwgth011epusq7/AABWx1YWuEaMoumHDOknbCA9a?dl=1"

echo "done; datasets under $(pwd)"
