"""Dataset pipeline builders: plan / apply / redact + ordering & output."""
