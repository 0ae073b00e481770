"""Login-form grammar (reference FormHandler.extractOne + SigInForm,
/root/reference/src/accreditation/FormHandler.py:26-39, Form.py:36-84):
form discovery, action/method attributes, input name/type parsing,
login classification (password input present) and pick_fields election
(first text else first email; first password).  The oracle twin runs in
tests/test_entry_contract.py::test_query_matches_oracle[form_parse].
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from artemis_spark.functions.markup import (  # noqa: E402
    first_login_form,
    parse_forms,
    render_login_page,
)


def _parse(spark, body: str):
    df = spark.createDataFrame([(body,)], "body string")
    return df.select(
        parse_forms(F.col("body")).alias("forms"),
        first_login_form(F.col("body")).alias("login"),
    ).collect()[0]


def test_render_roundtrip_and_decoy_classification(spark):
    row = _parse(
        spark, render_login_page("h.test", "/do_login", "usr", "pwd").decode()
    )
    forms = row["forms"]
    assert len(forms) == 2
    decoy, login = forms
    assert decoy["is_login"] is False and decoy["user_field"] == "q"
    assert login["is_login"] is True
    assert login["action"] == "/do_login" and login["method"] == "POST"
    assert login["user_field"] == "usr" and login["pass_field"] == "pwd"
    # extractOne: first login-classified form, decoys skipped
    assert row["login"]["pos"] == 2


def test_email_fallback_matches_pick_fields(spark):
    """SigInForm.pick_fields: `userfield or emailfield` (Form.py:57)."""
    row = _parse(
        spark,
        render_login_page("h", "/l", "em", "pw", user_type="email").decode(),
    )
    login = row["login"]
    # the decoy's text input belongs to ANOTHER form; within the login
    # form there is no text input, so the email field is elected
    assert login["user_field"] == "em" and login["pass_field"] == "pw"


def test_broken_form_is_not_login(spark):
    """No password input -> not classified login (NoPassField path)."""
    row = _parse(spark, render_login_page("h", "/l", "u", None).decode())
    assert row["login"] is None
    assert all(not f["is_login"] for f in row["forms"])


def test_password_only_form_has_null_user_field(spark):
    """NoUserField path: login-classified but unfillable."""
    row = _parse(
        spark, render_login_page("h", "/l", None, "pw", decoy=False).decode()
    )
    assert row["login"]["is_login"] is True
    assert row["login"]["user_field"] is None
    assert row["login"]["pass_field"] == "pw"


def test_grammar_tolerance(spark):
    """Case-insensitive tags/attrs, single quotes, entity unescape,
    default method GET, default input type text, unnamed inputs skipped
    (x.name is None keeps the slot open, Form.py:47-55)."""
    body = (
        "<FORM Action='a&amp;b'>"
        "<INPUT TYPE='PASSWORD'>"          # unnamed: slot stays open
        "<input type='password' name='P'>"  # first NAMED password wins
        "<input name='u'>"                  # type defaults to text
        "</FORM>"
    )
    row = _parse(spark, body)
    f = row["forms"][0]
    assert f["action"] == "a&b"
    assert f["method"] == "GET"
    assert f["n_inputs"] == 3
    assert f["is_login"] is True
    assert f["user_field"] == "u" and f["pass_field"] == "P"


def test_no_forms(spark):
    row = _parse(spark, "<html><body>nothing</body></html>")
    assert row["forms"] == [] and row["login"] is None
