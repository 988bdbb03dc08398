Feature: NamedPaths

  # The reference supports NO path values at all (its TCK blacklist
  # fails every named-path scenario in MatchAcceptance2 /
  # OptionalMatchAcceptance / PathEquality); fixed-length named paths
  # with length()/nodes()/relationships() are a beyond-parity capability
  # here. Single-hop VAR-LENGTH named paths are supported since round 7
  # (varlength_named_paths.feature).

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:City {name: 'ber'})-[:ROAD {km: 100}]->(b:City {name: 'ham'}),
             (b)-[:ROAD {km: 50}]->(c:City {name: 'kie'}),
             (:City {name: 'muc'})
      """

  Scenario: Return a whole path value
    When executing query:
      """
      MATCH p = (:City {name: 'ber'})-[:ROAD]->(x) RETURN p
      """
    Then the result should be, in any order:
      | p                                                     |
      | <(:City {name: 'ber'})-[:ROAD {km: 100}]->(:City {name: 'ham'})> |
    And no side effects

  Scenario: Handling direction of named paths
    When executing query:
      """
      MATCH p = (:City {name: 'ham'})<-[:ROAD]-(x) RETURN p
      """
    Then the result should be, in any order:
      | p                                                      |
      | <(:City {name: 'ham'})<-[:ROAD {km: 100}]-(:City {name: 'ber'})> |
    And no side effects

  Scenario: length of a two-hop named path
    When executing query:
      """
      MATCH p = (:City {name: 'ber'})-[:ROAD]->()-[:ROAD]->(t)
      RETURN length(p) AS l, t.name AS t
      """
    Then the result should be, in any order:
      | l | t     |
      | 2 | 'kie' |
    And no side effects

  Scenario: Zero-length named path
    When executing query:
      """
      MATCH p = (c:City {name: 'muc'}) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 0 |
    And no side effects

  Scenario: nodes and relationships of a named path
    When executing query:
      """
      MATCH p = (:City {name: 'ber'})-[:ROAD]->()-[:ROAD]->()
      RETURN [n IN nodes(p) | n.name] AS ns,
             [r IN relationships(p) | r.km] AS kms
      """
    Then the result should be, in any order:
      | ns                    | kms       |
      | ['ber', 'ham', 'kie'] | [100, 50] |
    And no side effects

  Scenario: Named paths in optional matches
    When executing query:
      """
      MATCH (c:City) OPTIONAL MATCH p = (c)-[:ROAD]->(x)
      RETURN c.name AS name, length(p) AS l
      """
    Then the result should be, in any order:
      | name  | l    |
      | 'ber' | 1    |
      | 'ham' | 1    |
      | 'kie' | null |
      | 'muc' | null |
    And no side effects

  Scenario: Optionally matching named paths returns null paths
    When executing query:
      """
      MATCH (c:City {name: 'muc'}) OPTIONAL MATCH p = (c)-[:ROAD]->(x)
      RETURN p
      """
    Then the result should be, in any order:
      | p    |
      | null |
    And no side effects

  Scenario: Aggregation with named paths
    When executing query:
      """
      MATCH p = (:City)-[:ROAD]->()
      RETURN count(length(p)) AS hops, sum(length(p)) AS total
      """
    Then the result should be, in any order:
      | hops | total |
      | 2    | 2     |
    And no side effects

  Scenario: Undirected hop in a named path records per-row orientation
    When executing query:
      """
      MATCH p = (:City {name: 'ham'})-[:ROAD]-(x)
      RETURN [n IN nodes(p) | n.name] AS ns
      """
    Then the result should be, in any order (ignoring element order for lists):
      | ns             |
      | ['ham', 'ber'] |
      | ['ham', 'kie'] |
    And no side effects

  Scenario: Variable-length named paths bind runtime lengths
    # supported since round 7 — see varlength_named_paths.feature
    When executing query:
      """
      MATCH p = (a)-[:ROAD*1..2]->(b) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 1 |
      | 1 |
      | 2 |
    And no side effects
