"""Check specs, runner, state ledger, scheduler."""
