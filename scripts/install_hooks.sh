#!/bin/sh
# Installs the pre-commit parity-sync guard into .git/hooks (hooks are
# not version-controlled; run once per clone).
repo="$(cd "$(dirname "$0")/.." && pwd)"
hook="$repo/.git/hooks/pre-commit"
cat > "$hook" <<'HOOK'
#!/bin/sh
# Block commits that change the query registry without regenerating
# ORACLE_PARITY.json (see scripts/check_parity_sync.py).
if git diff --cached --name-only | grep -qE '^(oxford_data_pipeline_spark/plans/|__spark_entry__\.py)'; then
    python scripts/check_parity_sync.py || exit 1
fi
# Block commits that leave ADVICE.md items untriaged (stale advisor
# signal — see scripts/check_advice_sync.py).
if git diff --cached --name-only | grep -qx 'ADVICE.md'; then
    python scripts/check_advice_sync.py || exit 1
fi
HOOK
chmod +x "$hook"
echo "installed $hook"
