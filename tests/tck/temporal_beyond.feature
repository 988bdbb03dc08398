Feature: TemporalBeyond

  # Temporal behaviors from official-TCK families the reference
  # blacklists wholesale (temporal_blacklist: TemporalTruncateAcceptance,
  # TemporalSelectAcceptance, DurationBetweenAcceptance,
  # TemporalToStringAcceptance, TemporalComparisonAcceptance).

  Scenario: Truncating a date to month and year
    Given any graph
    When executing query:
      """
      WITH date('2024-03-15') AS d
      RETURN toString(date.truncate('month', d)) AS m,
             toString(date.truncate('year', d)) AS y
      """
    Then the result should be, in any order:
      | m            | y            |
      | '2024-03-01' | '2024-01-01' |
    And no side effects

  Scenario: Truncating to week lands on Monday
    Given any graph
    When executing query:
      """
      RETURN toString(date.truncate('week', date('2024-03-15'))) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2024-03-11' |
    And no side effects

  Scenario: Truncating to decade and century
    Given any graph
    When executing query:
      """
      WITH date('2024-03-15') AS d
      RETURN toString(date.truncate('decade', d)) AS dec,
             toString(date.truncate('century', d)) AS cen
      """
    Then the result should be, in any order:
      | dec          | cen          |
      | '2020-01-01' | '2000-01-01' |
    And no side effects

  Scenario: Truncating a local datetime to hour and day
    Given any graph
    When executing query:
      """
      WITH localdatetime('2024-03-15T10:47:33') AS t
      RETURN localdatetime.truncate('hour', t).minute AS m,
             localdatetime.truncate('day', t).hour AS h
      """
    Then the result should be, in any order:
      | m | h |
      | 0 | 0 |
    And no side effects

  Scenario: Truncating to quarter
    Given any graph
    When executing query:
      """
      RETURN toString(date.truncate('quarter', date('2024-05-15'))) AS q
      """
    Then the result should be, in any order:
      | q            |
      | '2024-04-01' |
    And no side effects

  Scenario: An unknown truncation unit is an error
    Given any graph
    When executing query:
      """
      RETURN date.truncate('fortnight', date('2024-03-15')) AS d
      """
    Then a SyntaxError should be raised at compile time: UnknownUnit
    And no side effects

  Scenario: duration.between two dates in days
    Given any graph
    When executing query:
      """
      RETURN duration.between(date('2024-03-01'), date('2024-03-15')).days AS d
      """
    Then the result should be, in any order:
      | d  |
      | 14 |
    And no side effects

  Scenario: duration.between local datetimes selects hours and minutes
    Given any graph
    When executing query:
      """
      WITH duration.between(localdatetime('2024-03-15T08:00:00'),
                            localdatetime('2024-03-15T10:30:00')) AS dur
      RETURN dur.hours AS h, dur.minutesOfHour AS m
      """
    Then the result should be, in any order:
      | h | m  |
      | 2 | 30 |
    And no side effects

  Scenario: Temporal accessors on a constructed date
    Given any graph
    When executing query:
      """
      WITH date('2024-03-15') AS d
      RETURN d.year AS y, d.quarter AS q, d.month AS m, d.day AS dd,
             d.week AS w, d.ordinalDay AS o
      """
    Then the result should be, in any order:
      | y    | q | m | dd | w  | o  |
      | 2024 | 1 | 3 | 15 | 11 | 75 |
    And no side effects

  Scenario: toString round-trips temporals
    Given any graph
    When executing query:
      """
      RETURN toString(date('2024-03-15')) AS d,
             toString(localdatetime('2024-03-15T10:30:00')) AS t
      """
    Then the result should be, in any order:
      | d            | t                     |
      | '2024-03-15' | '2024-03-15 10:30:00' |
    And no side effects

  Scenario: Comparing dates and datetimes
    Given any graph
    When executing query:
      """
      RETURN date('2024-01-01') < date('2024-06-01') AS a,
             localdatetime('2024-01-01T00:00:01') > localdatetime('2024-01-01T00:00:00') AS b,
             date('2024-01-01') = date('2024-01-01') AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | true | true |
    And no side effects

  Scenario: Date ordering with ORDER BY
    Given any graph
    When executing query:
      """
      UNWIND [date('2024-06-01'), date('2023-01-01'), date('2024-01-01')] AS d
      RETURN toString(d) AS s ORDER BY d
      """
    Then the result should be, in order:
      | s            |
      | '2023-01-01' |
      | '2024-01-01' |
      | '2024-06-01' |
    And no side effects

  Scenario: Date plus and minus durations
    Given any graph
    When executing query:
      """
      WITH date('2024-01-31') AS d
      RETURN toString(d + duration('P1D')) AS plus,
             toString(d - duration('P31D')) AS minus
      """
    Then the result should be, in any order:
      | plus         | minus        |
      | '2024-02-01' | '2023-12-31' |
    And no side effects
