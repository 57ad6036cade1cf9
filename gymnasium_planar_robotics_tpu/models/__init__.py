"""Environment families as pure functions over (config, params, state)."""
