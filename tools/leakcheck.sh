#!/bin/bash
# Self-evidencing leak scan (ADVICE r10: the driver's LEAKCHECK.json is
# not distinguishable from a stale copy — this builder-side scan stamps
# the scanned commit SHA + timestamp so each run is self-evidencing).
# Greps the tracked tree for anything that looks like non-public
# provenance: internal-looking imports/URLs/buckets/env vars, API keys.
# Usage: tools/leakcheck.sh [out_json]   (default LEAKCHECK_local.json)
set -e -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-LEAKCHECK_local.json}
SHA=$(git rev-parse HEAD)
NOW=$(date -u +%Y-%m-%dT%H:%M:%SZ)

scan() { # label regex — hits travel via stdin, never source-code
         # interpolation (ADVICE r11: a matched line containing \x
         # escapes or a quote next to the heredoc delimiter was a
         # silent Python SyntaxError swallowed by the sed pipe)
  local label=$1 re=$2
  local hits
  hits=$(git grep -nIiE "$re" -- ':!*.json' ':!LEAKCHECK*' ':!tools/leakcheck.sh' || true)
  printf '%s' "$hits" | python3 -c '
import json, sys
hits = sys.stdin.read().strip()
print(json.dumps({sys.argv[1]: hits.splitlines() if hits else []}))' "$label"
}

{
  echo '{'
  echo "  \"scanned_commit\": \"$SHA\","
  echo "  \"scanned_at\": \"$NOW\","
  echo '  "scans": ['
  scan internal-import '^import (com|net|org)\.(anthropic|internal)\.' | sed 's/^/    /;s/$/,/'
  scan internal-url 'https?://[a-z0-9.-]*\.(corp|internal)[/.]' | sed 's/^/    /;s/$/,/'
  scan bucket '(s3|gs)://[a-z0-9._-]*(internal|private|corp)' | sed 's/^/    /;s/$/,/'
  scan slack-link '\bgo/[a-z][a-z0-9-]+\b|#[a-z-]*-(internal|eng)\b' | sed 's/^/    /;s/$/,/'
  scan api-key '(sk|pk)-[A-Za-z0-9]{20,}|AKIA[A-Z0-9]{16}' | sed 's/^/    /'
  echo '  ]'
  echo '}'
} > "$OUT"
python3 -c "import json; d=json.load(open('$OUT')); n=sum(len(v) for s in d['scans'] for v in s.values()); print('leakcheck', d['scanned_commit'][:8], 'hits:', n)"
